"""A/B probe: corpus term-frequency plan shapes."""

import sys
import time

from pyspark.sql import functions as F

from database_importer_spark.plans.registry import t
from database_importer_spark.session import get_spark


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def tmin(build, n=5):
    mat(build())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        mat(build())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    sf_dir = sys.argv[1]
    spark = get_spark("probe_tf")
    spark.sparkContext.setLogLevel("ERROR")
    d = t(spark, sf_dir, "documents")

    def naive():
        return (
            d.select(F.explode(F.split(F.lower("text"), " ")).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("term_count"))
            .orderBy(F.col("term_count").desc(), "term")
            .limit(20)
        )

    def runs_contrib():
        st = d.withColumn("__st", F.array_sort(F.split(F.lower("text"), " ")))
        pos = st.withColumn("__i", F.explode(F.expr("sequence(1, size(__st))")))
        marked = pos.select(
            F.expr("element_at(__st, __i)").alias("term"),
            F.expr(
                "CASE WHEN __i = 1 OR element_at(__st, __i) != element_at(__st, __i - 1) "
                "THEN -(__i - 1) ELSE 0 END + "
                "CASE WHEN __i = size(__st) OR element_at(__st, __i) != element_at(__st, __i + 1) "
                "THEN __i ELSE 0 END"
            ).alias("contrib"),
            F.expr(
                "(__i = 1 OR element_at(__st, __i) != element_at(__st, __i - 1)) OR "
                "(__i = size(__st) OR element_at(__st, __i) != element_at(__st, __i + 1))"
            ).alias("keep"),
        ).filter("keep")
        return (
            marked.groupBy("term")
            .agg(F.sum("contrib").cast("bigint").alias("term_count"))
            .orderBy(F.col("term_count").desc(), "term")
            .limit(20)
        )

    def hof_runs():
        st = d.withColumn("__st", F.array_sort(F.split(F.lower("text"), " ")))
        runs = st.withColumn(
            "__runs",
            F.expr(
                "aggregate(sequence(1, size(__st)), "
                "cast(array() as array<struct<t:string,c:bigint>>), "
                "(acc, i) -> CASE WHEN i = 1 OR element_at(__st, i) != element_at(__st, i - 1) "
                "THEN array_append(acc, struct(element_at(__st, i) as t, 1L as c)) "
                "ELSE array_append(slice(acc, 1, size(acc) - 1), "
                "struct(element_at(acc, size(acc)).t as t, element_at(acc, size(acc)).c + 1 as c)) END)"
            ),
        )
        idx = runs.withColumn("__j", F.explode(F.expr("sequence(1, size(__runs))")))
        pairs = idx.select(
            F.expr("element_at(__runs, __j).t").alias("term"),
            F.expr("element_at(__runs, __j).c").alias("c"),
        )
        return (
            pairs.groupBy("term")
            .agg(F.sum("c").cast("bigint").alias("term_count"))
            .orderBy(F.col("term_count").desc(), "term")
            .limit(20)
        )

    shapes = {"naive": naive, "runs_contrib": runs_contrib, "hof_runs": hof_runs}
    pick = sys.argv[2:] or list(shapes)
    ref = None
    for name in pick:
        b = shapes[name]
        sec = tmin(b)
        rows = tuple(map(tuple, b().collect()))
        ok = "" if ref is None or rows == ref else "  !! RESULT MISMATCH"
        ref = ref or rows
        print(f"{name:14s} {sec:7.3f}s{ok}")


if __name__ == "__main__":
    main()
