"""kgce — a PySpark-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of
uf-hobi-informatics-lab/ClinicalTransformerNER (reference at /root/reference,
see SURVEY.md) as an idiomatic Spark DataFrame pipeline:

    pages -> sentences -> BIO tags -> mentions -> triples -> linked KG

All stages are ``DataFrame -> DataFrame`` functions with declared schemas;
sequential reference logic (BIO repair, span decode, eval credit assignment)
lives either in vectorized Arrow UDFs (sentence-local) or window functions
(relational), never in per-row Python.
"""

__version__ = "0.1.0"
