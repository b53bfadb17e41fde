"""End-to-end example: the reference's PyPI graph workload on this engine.

This is the user journey of the reference repo's ``examples/run_whole.py``
(crawl pypi.org JSON -> tabularize -> extract node/link tables -> validate
-> entity-resolve near-duplicate authors -> rewrite ids -> group -> export
typed CSVs for RedisGraph bulk load), re-expressed on the Spark engine.
Run it directly:

    python examples/pypi_graph_pipeline.py [output_dir]

It is self-contained: the HTTP "crawl" uses an injected fetcher over a
small built-in payload set (the same seam the tests use), so no network
access happens — swap ``fake_pypi_fetcher`` for ``None`` in
``fetch_json_table`` to crawl the real https://pypi.org/pypi/<pkg>/json
endpoints.  Every stage prints its row counts so you can follow the
dataflow; the result is a directory of RedisGraph bulk-insert CSVs plus
the Parquet stage tables the Engine materialized.

Reference analogs, stage by stage (paths in the reference repo):
  crawl          examples/canon/crawler.py   -> sources/http.fetch_json_table
  tabularize     examples/canon/tabularize.py-> parse_json_body + explodes
  node/link SQL  examples/graph/subgraph/*   -> DataFrame extraction + stable_id
  validation     examples/metagraph validation -> MetaGraph.validators (V1)
  ER             examples/graph/resolution/* -> er.resolution.resolve_entities
  id conversion  examples/graph/resolution/convertor.py -> er.clustering.convert_ids
  grouping       examples/graph/group/*      -> MetaGraph.group_nodes / group_links
  export         examples/graph/export.py    -> sources/redisgraph.write_*_csv
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dropbox_duckdb_playground_spark.engine import Engine
from dropbox_duckdb_playground_spark.er.clustering import convert_ids
from dropbox_duckdb_playground_spark.er.resolution import resolve_entities
from dropbox_duckdb_playground_spark.graph.metagraph import MetaGraph
from dropbox_duckdb_playground_spark.operators.relational import stable_id
from dropbox_duckdb_playground_spark.session import get_spark
from dropbox_duckdb_playground_spark.sources.http import (
    fetch_json_table,
    parse_json_body,
)
from dropbox_duckdb_playground_spark.sources.redisgraph import (
    write_redisgraph_links_csv,
    write_redisgraph_nodes_csv,
)

# A tiny PyPI-shaped corpus. "John Smith" vs "john  smith" is the
# near-duplicate the ER stage resolves into one author entity.
PACKAGES = {
    "alpha": {"name": "alpha", "author": "John Smith", "license": "MIT",
              "requires_dist": ["beta>=1.0", "gamma"]},
    "beta": {"name": "beta", "author": "john  smith", "license": "MIT",
             "requires_dist": ["gamma"]},
    "gamma": {"name": "gamma", "author": "Jane Doe", "license": "BSD",
              "requires_dist": None},
    "delta": {"name": "delta", "author": "Jane Doe", "license": "MIT",
              "requires_dist": ["alpha", "epsilon"]},  # epsilon: dangling
}

INFO_SCHEMA = (
    "name string, author string, license string, requires_dist array<string>"
)


def fake_pypi_fetcher(url: str, etag: str | None):
    """(status, body, etag) like sources/http.default_fetcher — but
    served from PACKAGES instead of the network."""
    pkg = url.rstrip("/json").rsplit("/", 1)[-1]
    if pkg not in PACKAGES:
        return 404, None, None
    return 200, json.dumps({"info": PACKAGES[pkg]}), f'W/"{pkg}-v1"'


def main(out_root: str) -> None:
    spark = get_spark("pypi-graph-example")
    eng = Engine(spark=spark, root=out_root)

    # 1. crawl (S7): url table -> (url, status, body, etag); the fetcher
    #    runs Arrow-batched on executors, so a real crawl parallelizes by
    #    repartitioning the url list.
    urls = spark.createDataFrame(
        [(f"https://pypi.org/pypi/{p}/json",) for p in PACKAGES], ["url"]
    )
    fetched = fetch_json_table(urls, fetcher=fake_pypi_fetcher)
    eng.register("raw_latest", fetched.filter(F.col("status") == 200))
    print(f"crawled: {eng.table('raw_latest').count()} package payloads")

    # 2. tabularize (N1/N3): typed parse + requirement explode
    flat = parse_json_body(
        eng.table("raw_latest"), f"info struct<{INFO_SCHEMA}>"
    ).select("parsed.info.*")
    eng.register("latest_flat", flat)
    requires = (
        flat.select("name", F.explode("requires_dist").alias("spec"))
        .withColumn("req", F.regexp_extract("spec", r"^[A-Za-z0-9_\-]+", 0))
    )
    print(f"tabularized: {flat.count()} packages, {requires.count()} requires edges")

    # 3. node/link extraction with stable ids (F1/F2)
    eng.register("package", flat.select(
        stable_id("name").alias("node_id"), "name", "license"))
    eng.register("author", flat.filter(F.col("author").isNotNull()).select(
        stable_id("author").alias("node_id"),
        F.col("author").alias("name")).distinct())
    eng.register("has_author", flat.select(
        stable_id("name").alias("from_id"), stable_id("author").alias("to_id")))
    eng.register("requires", requires.select(
        stable_id("name").alias("from_id"), stable_id("req").alias("to_id")))

    # 4. referential validation (V1): a requires edge must point at a
    #    known package. 'epsilon' is dangling on purpose — the reference
    #    EXCLUDES such links (exclusion semantics), so filter, then the
    #    validator proves the survivors are clean.
    mg = MetaGraph(triplets={
        "has_author": ("package", "author"),
        "requires": ("package", "package"),
    })
    known = eng.table("package").select(F.col("node_id").alias("to_id"))
    eng.register("requires", eng.table("requires").join(known, "to_id", "semi"))
    for v in mg.validators():
        v.run(eng)  # raises ValidationError if any link dangles
    print(f"validated: {eng.table('requires').count()} requires edges survive")

    # 5. ER (E1-E9): cluster near-duplicate author spellings, then
    #    rewrite author links through the (messy_id -> new_id) mapper.
    mapper = resolve_entities(eng.table("author"), canon=None)
    eng.register("has_author", convert_ids(
        eng.table("has_author"), mapper, ["to_id"]))
    eng.register("author", convert_ids(
        eng.table("author"), mapper, ["node_id"]).groupBy("node_id").agg(
        F.min("name").alias("name")))
    print(f"resolved: {eng.table('author').count()} author entities "
          f"(from {flat.count()} rows)")

    # 6. grouping + export (S10/F10): typed RedisGraph bulk-insert CSVs
    for node in mg.nodes:
        write_redisgraph_nodes_csv(
            mg.group_nodes(eng, node), f"{out_root}/csv/{node}", label=node)
    for link in mg.links:
        write_redisgraph_links_csv(
            mg.group_links(eng, link), f"{out_root}/csv/{link}")
    # persist the stage tables like the reference's storage layer
    for obj_id in ("package", "author", "has_author", "requires"):
        eng.save(obj_id)
    print(f"exported: RedisGraph CSVs + Parquet stages under {out_root}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="pypi_graph_"))
