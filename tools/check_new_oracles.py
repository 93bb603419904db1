"""Dev tool: side-by-side Spark-vs-DuckDB check for named registry
queries at sf0.01 (the driver's t2 mirror) — pass query names as argv;
the default list is just a smoke sample.

    PYTHONPATH=/root/repo python tools/check_new_oracles.py <name>...
"""
import importlib
import sys

from s3_elasticsearch_data_pipeline_spark import registry
from tests.oracle import compare, duckdb_conn

SF = "/root/testdata/sf0.01"
NAMES = ["sim_topk_bruteforce_arrow", "describe_table",
         "image_resize_real", "text_bpe_encode"]


def main(spark, names=NAMES):
    importlib.reload(registry)
    con = duckdb_conn(SF)
    for name in names:
        df = registry.queries()[name](spark, SF)
        problems = compare(df, con, registry.oracle_sql()[name])
        print(name, "OK" if not problems else problems)
    con.close()


if __name__ == "__main__":
    from s3_elasticsearch_data_pipeline_spark.session import get_spark
    main(get_spark(), sys.argv[1:] or NAMES)
