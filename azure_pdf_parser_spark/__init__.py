"""PySpark-native main-content extraction engine.

A from-scratch Spark-first re-expression of the capabilities of
``climatepolicyradar/azure-pdf-parser`` (reference, read-only at
/root/reference): interleaved text+media documents go in as
``(doc_id, spans[])`` rows, ordered main-content span sequences plus
document metadata (md5, languages, page metadata, table blocks) come out
— all computed in-cluster with DataFrame expressions and vectorized
pandas/Arrow UDFs, never per-row Python.

Layout:
  schemas    — every StructType (input, layout IR, parser_output, manifest)
  model      — pure-Python oracle of the reference semantics (pytest spec)
  sources/   — table loaders + the deterministic text→spans derivation
  functions/ — column-expression libraries (spans, text stats, hashing)
  operators/ — the pipeline operators (O1..O19 of SURVEY.md §2) + the
               training-data ops (dedup, similarity, quality, fingerprint)
  plans/     — end-to-end pipeline assembly, resume manifest
  streaming/ — Structured Streaming variant of the extraction pipeline
"""

__version__ = "0.1.0"
