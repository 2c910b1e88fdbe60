"""AES message-body encryption (reference operators O7/O8/O9).

The reference encrypts every stanza with AES-128-CBC/PKCS5 under a hard-coded
16-byte key and IV, then Base64-encodes the raw ciphertext
(/root/reference/src/main/java/com/cansever/consumer/Encryptor.java:15-28,
key/IV at CassandraOutputFormat.java:39-40).  Rows whose encryption fails are
silently dropped (CassandraOutputFormat.java:105) -- operator O9.

Spark's builtin ``aes_encrypt`` (JVM-side, no Python UDF) covers the same
algorithm; one wire-format difference, verified empirically on Spark 4.1.2:

    Spark CBC output = IV || ciphertext   (IV prepended)
    Java reference   = ciphertext only    (IV fixed out-of-band)

so Java-parity ciphertext is ``substring(aes_encrypt(...), 17)`` and
decryption of a Java-parity blob re-prepends the IV.  PKCS5 and PKCS7 padding
coincide for AES's 16-byte blocks, so ``'PKCS'`` matches the Java
``AES/CBC/PKCS5Padding`` cipher byte-for-byte.

With a fixed valid 16-byte key, ``aes_encrypt`` itself cannot fail at
runtime; the O9 null-drop therefore reduces to null propagation (a NULL
stanza encrypts to NULL and is filtered), which is exactly the observable
behavior of the reference's try/catch-null pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Hard-coded key/IV from the reference (CassandraOutputFormat.java:39-40).
REFERENCE_KEY = "gokturk  gokturk"
REFERENCE_IV = "vezir   tonyukuk"

_MAX_LEN = 2147483647


def _lit_bin(s: str) -> Column:
    return F.lit(s.encode("utf-8"))


def aes_encrypt_b64(col: Column, key: str = REFERENCE_KEY, iv: str = REFERENCE_IV) -> Column:
    """O7: ``base64(AES_128_CBC_PKCS5(col))`` with Java-reference wire format.

    Deterministic for a fixed IV (the reference hard-codes one), hence
    golden-testable.  NULL in -> NULL out (O9 null-drop pairs with
    ``.isNotNull()``).
    """
    full = F.aes_encrypt(col.cast("binary"), _lit_bin(key), F.lit("CBC"), F.lit("PKCS"), _lit_bin(iv))
    # Drop the 16 IV bytes Spark prepends -> byte-identical to Encryptor.java.
    b64 = F.base64(F.substring(full, 17, _MAX_LEN))
    # Spark's base64 emits MIME-chunked output (\r\n every 76 chars) once the
    # ciphertext exceeds 57 bytes; commons-codec Base64.encodeBase64String
    # (Encryptor.java:22) is unchunked.  Strip the line breaks for parity
    # (golden known-answer test: tests/test_crypto_golden.py).
    return F.regexp_replace(b64, "[\\r\\n]", "")


def aes_decrypt_b64(col: Column, key: str = REFERENCE_KEY, iv: str = REFERENCE_IV) -> Column:
    """O8: inverse of :func:`aes_encrypt_b64` (Encryptor.java:30-43)."""
    blob = F.concat(_lit_bin(iv), F.unbase64(col))
    return F.aes_decrypt(blob, _lit_bin(key), F.lit("CBC"), F.lit("PKCS")).cast("string")


def null_drop(df, col_name: str):
    """O9: drop rows whose encrypted payload is NULL
    (CassandraOutputFormat.java:105)."""
    return df.filter(F.col(col_name).isNotNull())
