#!/bin/bash
# Round-9 probe campaign: sequential, one heavy run at a time, settle
# pauses between spill-heavy runs (the CLAUDE.md probe-hygiene rule).
set -u
cd /root/repo
LOG=/tmp/round9_probes.log
: > "$LOG"

echo "=== sweep sf0.1 ===" | tee -a "$LOG"
python scripts/sweep_sf01.py > docs/SWEEP_SF01_r9.txt 2>/dev/null
echo "sweep exit: $? ($(grep -c '|' docs/SWEEP_SF01_r9.txt 2>/dev/null) lines)" | tee -a "$LOG"
tail -3 docs/SWEEP_SF01_r9.txt | tee -a "$LOG"
sleep 60

echo "=== 10x splice ===" | tee -a "$LOG"
python scripts/scale_probe.py 10 \
  dedup_near_minhash dedup_near_exact \
  corpus_quality_gate_threshold corpus_perplexity_bucket_cuts \
  text_bpe_encode_docs text_repeated_ngrams text_ngram_novelty \
  corpus_lang_confusion stream_quality_gate agg_quantile_histogram \
  sim_knn_ivf_pq ts_mad_outliers >> "$LOG" 2>/dev/null
sleep 60

echo "=== minhash verify probe (100x, df monitor) ===" | tee -a "$LOG"
python scripts/probe_minhash_verify.py >> "$LOG" 2>/dev/null
sleep 120

echo "=== 100x rows ===" | tee -a "$LOG"
for op in dedup_near_exact corpus_quality_gate_threshold \
          corpus_perplexity_bucket_cuts text_bpe_encode_docs \
          text_repeated_ngrams text_ngram_novelty; do
  echo "--- 100x $op" | tee -a "$LOG"
  python scripts/scale_probe.py 100 "$op" 2>/dev/null | grep '^|' >> "$LOG"
  sleep 60
done

echo "=== 1000x rows ===" | tee -a "$LOG"
for op in corpus_quality_gate_threshold corpus_perplexity_bucket_cuts \
          text_bpe_encode_docs text_repeated_ngrams dedup_near_minhash; do
  echo "--- 1000x $op" | tee -a "$LOG"
  python scripts/scale_probe.py 1000 "$op" 2>/dev/null | grep '^|' >> "$LOG"
  echo "exit: $?" >> "$LOG"
  sleep 120
done

rm -rf /tmp/pts_tier_stage10 /tmp/pts_tier_stage100 /tmp/pts_tier_stage1000
echo "=== DONE ===" | tee -a "$LOG"
