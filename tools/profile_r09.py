"""Round-9 optimization harness: per-query timing + plan capture.

Usage:
  python tools/profile_r09.py plans [--dir plans/r09] [--suffix before] q1 q2 ...
      -> writes plans/r09/<q>_<suffix>.txt with .explain("formatted")
  python tools/profile_r09.py time [--n 3] q1 q2 ...
      -> per-query noop-sink wall (fresh cache per rep, median printed)

Both read $SPARK_GRAFT_SF_DIR (default sf0.1) / $SPARK_GRAFT_CPUS and use
the same session + cache hygiene as bench.py so numbers are comparable.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opengemini_spark.session import get_spark  # noqa: E402
from opengemini_spark import suite  # noqa: E402
from opengemini_spark.datapipe.similarity import unpersist_lsh_caches  # noqa: E402


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    out_dir = "plans/r09"
    suffix = "before"
    n_rep = 3
    out_path: str | None = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--dir":
            out_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--n":
            n_rep = int(args[i + 1])
            i += 2
        elif args[i] == "--out":
            # results file: stdout gets interleaved with the Spark console
            # progress bar's \r frames, which can glue a result line onto
            # spinner text and defeat line-oriented postprocessing
            out_path = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    def emit(line: str) -> None:
        print(line)
        if out_path:
            with open(out_path, "a") as f:
                f.write(line + "\n")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_r09")
    qs = suite.queries()

    if mode == "plans":
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            fn = qs[name]
            setup = suite.SETUP.get(name)
            if setup is not None:
                setup(spark, sf_dir)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"# wrote {path} ({len(plan)} bytes)")
            unpersist_lsh_caches()
            spark.catalog.clearCache()
    elif mode == "time":
        # warmup at sf0.001 mirrors bench.py
        warm_dir = "/root/testdata/sf0.001"
        for name in names:
            fn = qs[name]
            setup = suite.SETUP.get(name)
            if os.path.isdir(warm_dir):
                try:
                    if setup is not None:
                        setup(spark, warm_dir)
                    fn(spark, warm_dir).count()
                except Exception as e:
                    print(f"# warmup {name}: {e}", file=sys.stderr)
                unpersist_lsh_caches()
                spark.catalog.clearCache()
        for name in names:
            fn = qs[name]
            setup = suite.SETUP.get(name)
            walls = []
            for _ in range(n_rep):
                if setup is not None:
                    setup(spark, sf_dir)
                spark.sparkContext.setJobDescription(f"r09:{name}")
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)
                unpersist_lsh_caches()
                spark.catalog.clearCache()
            med = statistics.median(walls)
            emit(
                f"{name}: median={med:.3f}s reps="
                + ",".join(f"{w:.3f}" for w in walls)
            )
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
