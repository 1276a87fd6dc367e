"""N-vs-4N determinism evidence: run the identical crawl in two fresh
subprocesses at different local parallelism and diff the crawl logs and
final frontiers bit-for-bit. Usage:

    python tools/determinism_check.py [low_cores] [high_cores]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile

CHILD = """
import json, sys
from borges_spark.session import get_spark
from borges_spark.sources.synthetic_web import WebConfig, gen_pages, gen_seeds
from borges_spark.plans.engine import CrawlConfig, CrawlEngine
from borges_spark.plans.checkpoint import SnapshotStore
from borges_spark.operators.politeness import PolitenessConfig

cores, store = int(sys.argv[1]), sys.argv[2]
spark = get_spark(cores=cores, app_name=f"det{cores}", shuffle_partitions=2*cores)
web = WebConfig(n_pages=3000, n_hosts=20, out_degree=4, n_seeds=50)
cfg = CrawlConfig(max_rounds=4, order_mode="priority", use_bloom=True, fail_every=13,
                  politeness=PolitenessConfig(default_delay_s=0.5, round_budget_s=60.0))
engine = CrawlEngine(spark, gen_pages(spark, web), gen_seeds(spark, web), SnapshotStore(store), cfg)
engine.run(resume=False)
log = [(r["round"], r["rank_in_round"], r["url"], r["status"])
       for r in engine.crawl_log().orderBy("round", "rank_in_round").collect()]
frontier = sorted((r["url"], r["discovered_seq"], r["state"]) for r in engine.frontier().collect())
print(json.dumps({"log": log, "frontier": frontier}))
"""


def run_at(cores: int) -> dict:
    with tempfile.TemporaryDirectory() as store:
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(cores), store],
            capture_output=True, text=True, cwd="/root/repo", check=True,
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    a = run_at(low)
    b = run_at(high)
    same_log = a["log"] == b["log"]
    same_frontier = a["frontier"] == b["frontier"]
    print(json.dumps({
        "cores": [low, high],
        "log_rows": len(a["log"]),
        "frontier_rows": len(a["frontier"]),
        "identical_crawl_log": same_log,
        "identical_frontier": same_frontier,
    }))
    sys.exit(0 if (same_log and same_frontier) else 1)


if __name__ == "__main__":
    main()
