"""Production serving: checkpoint → low-latency top-k recommendations.

The reference has no serving story (training + offline eval only,
``src/train.py``); this subsystem is the deployment path the north star
asks for: a two-stage recommender (dot-tower full-catalog retrieval →
cross-attention reranking) compiled to fixed shapes, plus a
dependency-free JSON-lines service loop.
"""

from carca_tpu.serve.recommender import (Recommender, load_recommender,
                                         pad_histories)

__all__ = ["Recommender", "load_recommender", "pad_histories"]
