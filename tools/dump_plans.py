"""Dump .explain('formatted') for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <suffix> <query> [query ...]
Env: PLANS_TAG (default r09), SPARK_GRAFT_SF_DIR (default sf0.1).
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hgt2osm2_spark.session import get_spark


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    tag = os.environ.get("PLANS_TAG", "r09")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    for n in names:
        df = qs[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", n, suffix, len(plan.splitlines()), "lines")
    spark.stop()


if __name__ == "__main__":
    main()
