from .registry import (  # noqa: F401
    DRIVER_SWEEP_CAP,
    QuerySpec,
    all_specs,
    driver_specs,
    register,
)
