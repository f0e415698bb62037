#!/bin/bash
# r20 scale-tail sweep: the r19 protocol (r18 canonical tail + both margin
# tiers + the data-mixing family) PLUS the r20 closure ops — incremental
# dedup against the persisted index, DSIR vs a separate target relation,
# and the full curate→cap→resample composition — so every r20 op gets
# second-decade datapoints. Run at sf1 (matched-host reference) then sf3;
# min-of-3 per query via graft.Bench's standard protocol (canary-bracketed,
# hot-requeue).
cd /root/repo
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
QL="op_dedup_incremental,op_importance_target,op_pipeline_full,op_pipeline_mix,op_importance_resample,op_importance_weights,op_source_cap,op_bpe_encode,op_bpe_token_count,op_bpe_train,op_cdc_chunks,op_cdc_dedup,op_containment_pairs,op_corr_spearman,op_dedup_embedding,op_dedup_embedding_lsh,op_dedup_groups,op_dedup_jaccard,op_dedup_minhash,op_dedup_resolve,op_dedup_semantic_auto,op_dist_drift,op_fuzzy_words,op_graph_components,op_graph_triangles,op_kcore,op_lm_score,op_margin_align,op_margin_align_ann,op_minhash_est,op_multimodal_neardup,op_pipeline_curate,op_pmi_collocations,op_rare_tokens,op_sim_topk_ivfpq,op_sim_topk_ivfpq_res,op_simhash_pairs,op_simhash_pairs64,op_textrank,op_tf_cosine_pairs,op_tokenizer_fertility,q05_theta_join,q12_limit_offset,q18_percentiles,q25_within_group,q29_range_frame,q31_percentile_window"
for sf in "$@"; do
  SPARK_GRAFT_SF_DIR=testdata-$sf SPARK_GRAFT_BENCH_ONLY="$QL" \
  SPARK_GRAFT_BENCH_OUT=bench/bench_${sf}_tail_r20.json \
  java -Xmx8g $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > /tmp/bench_${sf}_tail.log 2>&1
  echo "[$sf] exit $?"
done
