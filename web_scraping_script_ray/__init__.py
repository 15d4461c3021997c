"""web_scraping_script_ray — a Ray-Data-native crawl / data-processing engine.

Brand-new engine with the query and data-processing capabilities of the
reference repo ``Abdelilah04116/Web_scraping-script`` (surveyed in
/root/repo/SURVEY.md), re-expressed Ray-Data-first:

- the synthetic web is a table of interleaved text+media documents
  ``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``;
- crawling is a round-based BFS driven by ``pipelines.crawl.CrawlEngine``:
  frontier expansion (``flat_map`` over link spans) → first-wins dedup
  (groupby / sharded cuckoo-filter actors) → robots + politeness scheduling
  (per-host shard actors) → fetch (bucketed lookup join actor pool) →
  ordered output with a deterministic ``crawl_seq``;
- generic relational / text / dedup / similarity operators live under
  ``functions/`` and ``pipelines/postprocess.py``.

Nothing here calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.1.0"
