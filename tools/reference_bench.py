#!/usr/bin/env python3
"""Head-to-head throughput: the reference SmartPipeline (pure Python, from
/root/reference) vs the Spark engine's typed pipeline (p01/p02 semantics) on
the same 600k lineitem records.

Replicates p01_pipeline_errors' stage logic exactly:
  enrich:   soft error if l_quantity > 45 else enriched = qty * 2
  validate: critical error if l_discount > 0.09 (skips later stages)
  finalize: enriched += 1
Usage: python3 tools/reference_bench.py [sfdir]
"""
import sys, time
sys.path.insert(0, "/root/reference")
import pyarrow.parquet as pq

from smartpipeline.pipeline import Pipeline
from smartpipeline.stage import Source, Stage
from smartpipeline.item import Item
from smartpipeline.error.exceptions import SoftError, CriticalError

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

rows = pq.read_table(f"{SF}/lineitem.parquet",
                     columns=["l_orderkey", "l_linenumber", "l_quantity",
                              "l_discount"]).to_pylist()
print(f"records: {len(rows)}")


class ListSource(Source):
    def __init__(self, data):
        self._it = iter(data)

    def pop(self):
        try:
            item = Item()
            item.data.update(next(self._it))
            item.data["enriched"] = 0.0
            return item
        except StopIteration:
            self.stop()
            return None


class Enrich(Stage):
    def process(self, item):
        if item.data["l_quantity"] > 45:
            raise SoftError(f"quantity {item.data['l_quantity']} too large")
        item.data["enriched"] = item.data["l_quantity"] * 2
        return item


class Validate(Stage):
    def process(self, item):
        if item.data["l_discount"] > 0.09:
            raise CriticalError("discount out of policy")
        return item


class Finalize(Stage):
    def process(self, item):
        item.data["enriched"] += 1
        return item


def run(concurrency=0, parallel=False, label=""):
    p = (Pipeline().set_source(ListSource(rows))
         .append("enrich", Enrich(), concurrency=concurrency, parallel=parallel)
         .append("validate", Validate(), concurrency=concurrency, parallel=parallel)
         .append("finalize", Finalize(), concurrency=concurrency, parallel=parallel)
         .build())
    t0 = time.time()
    n = sum(1 for _ in p.run())
    dt = time.time() - t0
    print(f"smartpipeline {label}: {n} items in {dt:.1f}s "
          f"({n/dt/1000:.0f}k items/s)")
    return dt


if __name__ == "__main__":
    run(0, False, "sequential")
    run(2, False, "2 threads/stage")
