"""Round-6 optimization measurement harness (guide §1.4): times
individual queries with the noop sink in a fresh session, and dumps
`.explain("formatted")` plans to plans/r06/.

NOT part of the frozen driver contract — bench.py stays the measured
surface. Usage:

    python bench_extra.py time  [sf_dir] [query ...]   # noop-sink seconds
    python bench_extra.py plan  [sf_dir] [query ...]   # write plans/r06/<q>_<tag>.txt
    BORGES_PLAN_TAG=before python bench_extra.py plan ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from borges_spark.session import get_spark

    return get_spark(cores=CPUS, app_name="bench_extra", shuffle_partitions=2 * CPUS)


def _queries():
    import __spark_entry__ as E

    qs = dict(E.queries())
    # raw production paths timed by the frozen bench
    qs["minhash_lsh_fast"] = E.q_minhash_lsh_fast_raw
    qs["simhash_fast"] = E.q_simhash_fast_raw
    qs["substring_dedup_fast"] = E.q_substring_dedup_raw
    return qs


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    spark = _spark()
    qs = _queries()
    if not names:
        names = list(qs)
    # warm JVM + one Arrow worker, mirroring bench.py's headline leg
    qs["topk_per_group"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(32).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    if mode == "time":
        out = {}
        for name in names:
            samples = []
            for _ in range(2):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                df = qs[name](spark, sf_dir)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            out[name] = {"steady": min(samples), "cold": samples[0]}
            print(json.dumps({name: out[name]}), flush=True)
        print(json.dumps({"total_steady": round(sum(v["steady"] for v in out.values()), 3)}))
    elif mode == "plan":
        tag = os.environ.get("BORGES_PLAN_TAG", "after")
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
