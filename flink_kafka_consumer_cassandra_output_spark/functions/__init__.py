from . import crypto, datetime_fns, numeric, taxonomy, text, vectors, xml_fns  # noqa: F401
