#!/usr/bin/env bash
# Tabular file glob -> lake (reference parity: boxer-excel; Excel-specific
# POI features are out of scope, the reader-option surface is the same).
spark-submit \
  --master yarn \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --class graft.apps.FileImport \
  graft.jar \
  --resource '/data/ca_dataset/2019/Quarter=4/*.csv' \
  --props conf/file-import.properties
