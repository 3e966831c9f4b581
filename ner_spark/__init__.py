"""ner_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of the reference ensemble-NER
pipeline (Valentin-Gauthier/NER, surveyed in SURVEY.md) as an idiomatic Spark
DataFrame pipeline, generalized into a full KG stage chain:

    docs (doc_id, spans[])                       S0 normalize
      -> dedup (group identical text)            S1
      -> mention extraction (3 extractors)       S2
      -> consensus fusion + priority vote        S3
      -> relation extraction -> triples          S4
      -> entity linking (broadcast gazetteer)    S5
      -> canonicalization (connected comps)      S6
      -> materialize (partitioned, manifested)   S7

Everything is DataFrame/Catalyst-first; Python only inside Arrow-batched
pandas UDFs. See SURVEY.md for the operator-by-operator mapping with
reference citations.
"""

__version__ = "0.1.0"
