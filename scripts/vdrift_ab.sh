#!/bin/bash
# Round-15 v-family drift A/B (VERDICT r14 ask #1): three fresh-JVM bench
# runs back-to-back in the SAME hour, with the new per-query stage-metric
# listener, to separate session-debt (v after the heavy d-block inflates
# vs isolated) from ambient machine drift (isolated runs repeat high/low).
# Artifact history already shows v_total 29.2 at 8764dc6 — a run with the
# PRE-reorder (r13) sweep order — so the reorder hypothesis has a strike
# against it before we start; this pins it with fresh same-hour evidence.
set -u
cd /root/repo
V=v10_pq_adc,v11_ivfpq,v12_ivfpq_rerank,v13_sq8_topk,v14_ivfsq,v15_binary_topk,v16_ann_join,v17_rotation,v18_index_persist,v19_filtered_ann,v1_knn_brute,v20_index_stats,v21_mmr,v22_ann_recall,v23_knn_graph_expand,v24_nndescent,v25_graph_admit,v2_lsh_buckets,v3_knn_lsh,v4_knn_ivf,v5_centroids,v6_kmeans_ivf,v7_knn_multiprobe,v8_ivf_admit,v9_pq_encode
D=d10_semdedup_capped,d11_minhash_oph,d12_containment,d13_soft_dedup,d14_lsh_recall,d1_exact_dedup,d2_minhash_lsh,d3_simhash,d4_ngram_jaccard,d5_embedding_dup,d6_simhash_near,d7_winnow_spans,d8_dup_spans,d9_semdedup

run() { # name, ONLY list
  echo "=== RUN $1 start $(date +%H:%M:%S) load $(cut -d' ' -f1 /proc/loadavg)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$2" SPARK_GRAFT_BENCH_OUT="/tmp/vab_$1.json" \
  sbt -batch "runMain graft.Bench" > "/tmp/vab_$1.out" 2> "/tmp/vab_$1.err"
  echo "=== RUN $1 done rc=$? $(date +%H:%M:%S)"
}

run viso1 "$V"
run vafterd "$D,$V"
run viso2 "$V"
echo VDRIFT_AB_DONE
