"""Device-side compute kernels: dense matmul+top-k, sparse BM25, fusion."""

from legal_rag_tpu.ops.dense import (
    l2_normalize,
    dense_topk,
    dense_topk_xla,
    dense_topk_pallas,
    dense_topk_twophase,
    dense_topk_twophase_rm,
)
from legal_rag_tpu.ops.sparse import (
    BM25Index,
    build_bm25,
    bm25_score_batch,
    bm25_topk,
)
from legal_rag_tpu.ops.maxsim import (
    MultiVectorIndex,
    maxsim_topk,
)
from legal_rag_tpu.ops.fusion import (
    weighted_fusion,
    rrf_fusion,
)

__all__ = [
    "l2_normalize",
    "dense_topk",
    "dense_topk_xla",
    "dense_topk_pallas",
    "dense_topk_twophase",
    "dense_topk_twophase_rm",
    "BM25Index",
    "build_bm25",
    "bm25_score_batch",
    "bm25_topk",
    "MultiVectorIndex",
    "maxsim_topk",
    "weighted_fusion",
    "rrf_fusion",
]
