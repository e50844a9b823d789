"""hexspark — a from-scratch PySpark-native entity-resolution engine.

Generalizes the capabilities of the reference kernel library
(mrecachinas/hexhamming: fast hamming distance over fixed-width hex/binary
fingerprints, within-distance predicates, one-vs-many first-match search)
into a full blocking + pairwise-scoring + transitive-clustering
record-linkage pipeline over tables of multi-turn conversation transcripts.

Layers
------
- ``hexspark.kernels``   : pure-numpy vectorized kernels (no Spark). Semantics
  anchored to /root/reference/hexhamming/python_hexhamming.{cc,h}.
- ``hexspark.compat``    : scalar drop-in API with the reference's exact
  error contract (ValueError messages, quirks) — a user of the reference can
  call ``hexspark.compat.hamming_distance_string`` unchanged.
- ``hexspark.columns``   : pandas/Arrow UDF Column functions for Spark.
- ``hexspark.pipeline``  : the ER pipeline (assemble → simhash → LSH blocking
  → scoring → connected components → eval), checkpointed and resumable.
- ``hexspark.ops``       : training-data-pipeline operators (dedup families,
  ANN search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
