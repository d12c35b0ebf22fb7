#!/bin/sh
# Round-4 measurement sequence — run AFTER scripts/train_production.py
# completes, with the chip otherwise idle. Logs land in /tmp/r4_*.log.
#
# 1/2: the nb5w -> nb5wp (Pallas march-select kernel) frame-level A/B on
#      the round-3-comparable synthetic head (--state none).
# 3/4: the trained-state headline (bench auto-adopts
#      trained/production_state.pkl) for both variants.
# 5:   the sub-100 ms live operating point: chunk=1, real-time audio
#      schedule (+ sync --latency derivation in the same run).
# 6:   quality guard on the TRAINED state with the kernel variant as the
#      production point J.
# 7:   att=1 vs att=2 quality cost on the trained model (latency item).
set -x
cd /root/repo

python bench.py --torso --state none              > /tmp/r4_1_nb5w_synth.log 2>&1
python bench.py --torso --state none --march-variant nb5wp \
                                                  > /tmp/r4_2_nb5wp_synth.log 2>&1
python bench.py --torso                           > /tmp/r4_3_nb5w_trained.log 2>&1
python bench.py --torso --march-variant nb5wp     > /tmp/r4_4_nb5wp_trained.log 2>&1
python bench.py --torso --march-variant nb5wp --chunk 1 --latency-live --latency \
                                                  > /tmp/r4_5_latency.log 2>&1
python scripts/quality_check.py --load-state /root/repo/trained/production_state.pkl \
    --march-variant nb5wp                         > /tmp/r4_6_quality.log 2>&1
python scripts/att_eval.py                        > /tmp/r4_7_att.log 2>&1
echo R4 MEASURE DONE
