"""B3 — fingerprint stage: 256-bit SimHash per conversation.

The signature width (256 bits = 64 hex chars) matches the reference
library's design fingerprint width (/root/reference/README.rst:58). The
SimHash itself runs in one Arrow-batched pandas UDF (hexspark.columns.
simhash256) — numpy token hashing + segment sums, no per-row Python — the
distributed analogue of the reference's SIMD string kernel
(python_hexhamming.h:320-423).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import columns as C


def signatures(conversations: DataFrame) -> DataFrame:
    """conversations(conv_id, doc_text, canon, n_turns, n_chars) →
    signatures(conv_id, sig binary(32), sig_hex char(64), canon, n_turns,
    n_chars)."""
    return (
        conversations.withColumn("sig", C.simhash256("doc_text"))
        .withColumn("sig_hex", C.sig_hex(F.col("sig")))
        .select("conv_id", "sig", "sig_hex", "canon", "n_turns", "n_chars")
    )
