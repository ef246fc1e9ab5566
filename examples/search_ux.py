"""Search-UX features riot never had: faceted counts over the full match
set, prefix autocomplete, and SymSpell spell correction — all from one
index.

Run from the repo root: python examples/search_ux.py
"""

import _path  # noqa: F401  (repo-root sys.path bootstrap)

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from riot_ray import EngineOpts, RankOpts, SearchReq
from riot_ray.build import IndexWriter
from riot_ray.corpus import write_corpus
from riot_ray.engine import LocalSearcher
from riot_ray.export import termstats_dataset
from riot_ray.pipelines import spell_correct, suggest_terms

src = write_corpus("/tmp/rr_ux/src/code.parquet", 2000, seed=7)
IndexWriter("/tmp/rr_ux/index", EngineOpts(mode="code")).build(src)
s = LocalSearcher("/tmp/rr_ux/index")

# facets: counts over EVERY matching doc (not the top-k), per attribute
resp = s.search(SearchReq(text="parse json", facets=("lang", "repo"),
                          rank_opts=RankOpts(max_outputs=3)))
print(f"{resp.num_docs} matches; by lang: {resp.facets['lang']}")
for h in resp.docs:
    print(f"  {h.bm25:8.3f}  {h.doc_id}")

# autocomplete + spell correction from the same term dictionary
terms = termstats_dataset("/tmp/rr_ux/index")
print("suggest 'pa':", suggest_terms(terms, "pa", k=5)["term"].to_pylist())
fix = spell_correct(terms, ["parze", "jsom"], k=3)
for q, t, d in zip(fix["query"].to_pylist(), fix["term"].to_pylist(),
                   fix["dist"].to_pylist()):
    print(f"did you mean: {q} -> {t} (dist {d})")

ray.shutdown()
