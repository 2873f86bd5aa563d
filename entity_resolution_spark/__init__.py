"""entity_resolution_spark — a PySpark-native record-linkage (entity-resolution) engine.

Built from scratch with the query/data-processing capabilities of the reference
``tamajyoti/entity_resolution`` (read-only at /root/reference), re-expressed Spark-first:

- input: a table of source-code files ``(repo, path, commit, lang, content)``
- blocking: exact keys (lang, content-sha prefix, normalized path tokens) + MinHash-LSH
  bands over shingled content, with multi-pass block-size caps and salting
  (reference semantics: ``am_combiner/blockers/common.py:100-201``,
  ``am_combiner/blockers/country.py:19-126``)
- pairwise scoring inside blocks: JVM-side set-similarity + batched string-similarity
  Arrow UDFs fed to a logistic scorer
  (reference semantics: ``am_combiner/combiners/tfidf.py``, ``am_combiner/combiners/ml.py``)
- transitive closure: iterative large-star/small-star connected components on the
  match-edge DataFrame (replaces ``nx.connected_components`` at
  ``am_combiner/combiners/common.py:167-172``)
- QA: pairwise precision/recall/F1, homogeneity/completeness/V-measure, OC/UC rates
  (reference semantics: ``am_combiner/qa``)

No code is copied from the reference; every module cites the reference behaviour it
reproduces and implements it with idiomatic DataFrame/SQL operations.
"""

__version__ = "0.1.0"
