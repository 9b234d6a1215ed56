"""Extra benchmarks for the optimization round (bench.py is frozen).

Per query: wall-clock split into DataFrame-build time (includes any
eager localCheckpoint sub-jobs), plan/explain time, and noop-sink
execution time (guide §1.4), plus Spark job/stage counts via a
per-query job group.  Writes plans/r06/<query>_<tag>.txt on request.

Usage:
  python bench_extra.py --queries dust_rules,entropy_docs --plans before
  python bench_extra.py --all            # profile every headline query
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

import pandas as pd  # noqa: F401  (pandas_udf type hints resolve via globals)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import HEADLINE, _force, _session, _warm_arrow_workers  # noqa: E402


def _explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def profile(names, plans_tag=None, reps=3):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _session(cpus, max(int(cpus), 8))
    qs = entry_mod.queries()
    _force(qs["pricing_agg"](spark, sf_dir))
    _warm_arrow_workers(spark)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    repo = os.path.dirname(os.path.abspath(__file__))
    out = {}
    for name in names:
        best = None
        for i in range(reps):
            group = f"{name}#{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            plan = _explain_str(df)
            t_plan = time.perf_counter() - t0
            t0 = time.perf_counter()
            _force(df)
            t_exec = time.perf_counter() - t0
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji:
                    n_stages += len(ji.stageIds)
            rec = {
                "build": round(t_build, 3),
                "plan": round(t_plan, 3),
                "exec": round(t_exec, 3),
                "total": round(t_build + t_exec, 3),
                "jobs": len(job_ids),
                "stages": n_stages,
                "exchanges": plan.count("Exchange"),
                "python_nodes": plan.count("EvalPython")
                + plan.count("MapInArrow")
                + plan.count("MapInPandas")
                + plan.count("FlatMapGroupsInPandas"),
            }
            if best is None or rec["total"] < best["total"]:
                best = rec
                best_plan = plan
        sc.setJobGroup(None, None)
        out[name] = best
        if plans_tag:
            os.makedirs(os.path.join(repo, "plans", "r06"), exist_ok=True)
            with open(
                os.path.join(repo, "plans", "r06", f"{name}_{plans_tag}.txt"),
                "w",
            ) as f:
                f.write(best_plan)
        print(json.dumps({name: best}), flush=True)
    spark.stop()
    ranked = sorted(out.items(), key=lambda kv: -kv[1]["total"])
    print(json.dumps({"ranked": [[n, r["total"], r["jobs"], r["stages"]] for n, r in ranked]}))
    return out


if __name__ == "__main__":
    plans_tag = None
    if "--plans" in sys.argv:
        plans_tag = sys.argv[sys.argv.index("--plans") + 1]
    if "--all" in sys.argv:
        names = list(HEADLINE)
    else:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    profile(names, plans_tag=plans_tag, reps=reps)
