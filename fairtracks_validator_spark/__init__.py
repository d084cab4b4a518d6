"""fairtracks_validator_spark — a PySpark-native schema + constraint validation engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
fairtracks/fairtracks_validator (reference at /root/reference), re-expressed as
declarative Spark DataFrame programs:

- per-row constraint checks (type/required/const/enum/pattern/range/format)
  compiled to vectorized ``Column`` expressions (reference: everit keyword
  dispatch behind ``ValidatedJSONSchema.java:329``),
- uniqueness / primary-key constraints as shuffle aggregations with
  first-writer-wins attribution (reference: ``ValidatedJSONSchema.java:373-392``),
- foreign-key / referential checks as broadcast/anti joins
  (reference: ``Validator.java:128-179``),
- CURIE/ontology-term format checks as broadcast dimension joins
  (reference: ``extensions/CurieFormat.java``, ``extensions/TermFormat.java``),
- column statistics, HLL cardinality sketches and KS/chi-square drift tests
  (north-star additions, no reference counterpart),
- large-scale training-data ops: dedup (exact/MinHash-LSH/SimHash/Jaccard),
  ANN similarity search, text quality analysis,
- per-partition lineage + checkpoint/resume.
"""

__version__ = "0.1.0"
