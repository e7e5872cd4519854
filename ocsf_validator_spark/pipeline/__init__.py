"""Large-scale training-data pipeline operators.

Beyond the reference's validation checks (SURVEY.md §2), a 100 TB
pipeline needs dedup / similarity / text-analysis / multimodal plumbing.
Everything here is built from JVM-side column expressions (codegen'd,
shuffle-conscious); Arrow-vectorized pandas UDFs appear only where column
algebra genuinely cannot express the op (multimodal decode).

Modules: dedup (exact/MinHash-LSH/SimHash/Jaccard + components),
similarity (ANN brute/LSH/IVF), textstats (tokens/quality/lang-ID/
fingerprints), select (n-gram top-k, stratified sampling, token-budget
cuts), decontam (benchmark overlap), temporal (as-of join, range join,
time rollup), multimodal (binary columns + decode plumbing), keywords
(TF-IDF, unigram log-prob), boilerplate (cross-doc template removal),
quantiles (exact distributed order stats), packing (sequence packing,
shard planning), render (conversation → training-text export).
"""
