#!/usr/bin/env bash
# JDBC -> lake import (reference parity: boxer-jdbc launch scripts).
# The correctness confs mirror the reference's always-passed set
# (SURVEY.md §4); graft.GraftExtensions registers the custom SQL functions.
spark-submit \
  --master yarn \
  --driver-memory 4g --executor-memory 4g --executor-cores 4 --num-executors 4 \
  --conf spark.serializer=org.apache.spark.serializer.KryoSerializer \
  --conf spark.kryoserializer.buffer.max=512m \
  --conf spark.sql.parquet.datetimeRebaseModeInRead=CORRECTED \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --class graft.apps.JdbcImport \
  graft.jar \
  --dialect mysql --table test.s_order \
  --props conf/mysql-import.properties \
  --hoodie-conf hoodie.upsert.shuffle.parallelism=32
