"""Training-data pipeline operators over web-scale corpora: deduplication,
similarity search, text analysis, multimodal column plumbing.

These extend the reference's index/query surface with the operations a
100 TB training-data pipeline needs (dedup, ANN, quality filtering); the
reference's closest analogs are updateDocument's delete-by-key dedup
(IndexWriter.java:1187) and MoreLikeThis term-vector similarity
(lucene/queries/src/java/org/apache/lucene/queries/mlt/MoreLikeThis.java).
"""
