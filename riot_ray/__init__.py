"""riot_ray — Ray-Data-native full-text index build + BM25 query engine.

From-scratch rebuild of the capabilities of go-ego/riot (reference analyzed
in SURVEY.md) on ray.data.Dataset / Arrow batches.  See riot_ray.build
(index pipeline), riot_ray.engine (serving), riot_ray.pipelines (dedup /
similarity / text-analysis extensions).
"""

from .config import BM25Params, EngineOpts
from .types import Expr, Logic, RankOpts, ScoredHit, SearchReq, SearchResp

__all__ = [
    "BM25Params",
    "EngineOpts",
    "Expr",
    "Logic",
    "RankOpts",
    "ScoredHit",
    "SearchReq",
    "SearchResp",
]
