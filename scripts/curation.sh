#!/usr/bin/env bash
# Training-corpus curation funnel -> curated keyed lake table.
# Stages (all config-driven, see graft.apps.CurationApp): lang-ID
# agreement, min-token + repetition filters, exact keep-first dedup,
# n-gram decontamination vs an eval set, per-source token budgets.
spark-submit \
  --master yarn \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --class graft.apps.CurationApp \
  graft.jar \
  --source '/lake/raw/documents' \
  --table-path '/lake/curated/documents' \
  --hoodie-conf hoodie.datasource.write.recordkey.field=doc_id \
  --hoodie-conf hoodie.datasource.write.precombine.field=doc_id \
  --hoodie-conf graft.curation.langid.enable=true \
  --hoodie-conf graft.curation.min.tokens=20 \
  --hoodie-conf graft.curation.eval.path=/lake/eval/benchmarks \
  --hoodie-conf graft.curation.budget.default=1000000000
