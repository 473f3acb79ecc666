#!/usr/bin/env bash
# Multi-table CDC stream -> per-table lake paths (reference parity:
# hudi-delta-streamer.sh). Table registry in tables.properties uses the
# ${db}.${table}.<key> namespace plus a `schema` DDL per table.
spark-submit \
  --master yarn \
  --driver-memory 4g --executor-memory 4g --executor-cores 4 --num-executors 4 \
  --conf spark.serializer=org.apache.spark.serializer.KryoSerializer \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --class graft.apps.CdcStreamApp \
  graft.jar \
  --source-dir /cdc/incoming \
  --checkpoint /cdc/checkpoints/run1 \
  --database-name-pattern db_issue_clear \
  --table-name-pattern "person,student" \
  --trigger-time 60 \
  --props conf/tables.properties \
  --hoodie-conf option.hoodie.path=/lake/{db}/ods_{db}_{table}
