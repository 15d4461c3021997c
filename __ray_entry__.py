"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself BEFORE importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship pipeline over /root/testdata/sf0.001 — documents
  → token counts → quality scores → language ID → exact dedup → per-lang
  summary (all streaming map_batches / groupby over zero-copy Arrow).
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 plus the training-data additions (dedup, similarity
  search, text analysis, multimodal, crawl) — see
  ``web_scraping_script_ray/pipelines/queries.py``.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  query (identical column names; integer-cent sums; floor6 floats).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: text-analysis + dedup pipeline over sf0.001 documents."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum

    from web_scraping_script_ray.functions.dedup import exact_dedup
    from web_scraping_script_ray.functions.text import (
        LangId,
        quality_scores,
        token_counts,
    )

    ds = ray.data.read_parquet(f"{SF0001}/documents.parquet")
    ds = ds.map_batches(token_counts, batch_format="pyarrow")
    ds = ds.map_batches(quality_scores, batch_format="pyarrow")
    ds = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 8))
    ds = exact_dedup(ds, "text", ["doc_id"])
    agg = ds.groupby("lang").aggregate(Count(), Sum("n_ws_tokens"), Sum("q_tokens"))

    def rename(batch: pa.Table) -> pa.Table:
        mapping = {
            "count()": "n_docs",
            "sum(n_ws_tokens)": "sum_ws_tokens",
            "sum(q_tokens)": "sum_q_tokens",
        }
        return batch.rename_columns([mapping.get(n, n) for n in batch.column_names])

    return agg.map_batches(rename, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from web_scraping_script_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from web_scraping_script_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
