"""Seed MySQL with the sf0.001 fixture tables for the live matrix.

Writes each fixture table into MySQL over JDBC (append) so scenarios
1-15 have the same rows the offline twins were verified on.  Runs only
inside the compose environment (needs MYSQL_URL + the JDBC driver jar
on the Spark classpath); in the sandbox it exits with a clear message.
"""

from __future__ import annotations

import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents"
).split()


def main() -> int:
    url = os.environ.get("MYSQL_URL")
    if not url:
        print("MYSQL_URL not set — this script runs inside integration/"
              "docker-compose.yml (make up && make seed), not the sandbox.")
        return 2
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("seed_mysql")
        .config("spark.jars", ",".join(
            f"/opt/jars/{j}" for j in os.listdir("/opt/jars")
        ) if os.path.isdir("/opt/jars") else "")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    user = os.environ.get("DB_USER", "repl")
    pw = os.environ.get("DB_PASSWORD", "repl")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", t)
            .option("user", user)
            .option("password", pw)
            .option("driver", "com.mysql.cj.jdbc.Driver")
            .mode("overwrite")
            .save()
        )
        print(f"seeded {t}: {df.count()} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
