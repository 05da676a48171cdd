from .bm25 import BM25Stats, bm25_idf, bm25_score, brute_force_topk  # noqa: F401
