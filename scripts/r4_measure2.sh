#!/bin/sh
# Round-4 measurements part 2 (after the VMEM-aware kernel tile fix):
# the trained-state numbers at HONEST budgets (the serving session's
# adaptive rebuild converges to the full-frame budget on this crust).
set -x
cd /root/repo
python bench.py --torso --march-variant nb5wp   > /tmp/r4_4_nb5wp_trained.log 2>&1
python bench.py --torso --march-variant nb5wp --budget-frac 1.0 \
                                                > /tmp/r4_8_nb5wp_full.log 2>&1
python bench.py --torso --march-variant nb5wp --budget-frac 1.0 --sample-frac 0.5 \
                                                > /tmp/r4_9_nb5wp_full_sc.log 2>&1
python scripts/quality_check.py --load-state /root/repo/trained/production_state.pkl \
    --march-variant nb5wp                       > /tmp/r4_6_quality.log 2>&1
python scripts/att_eval.py                      > /tmp/r4_7_att.log 2>&1
python bench.py --torso --march-variant nb5wp --chunk 1 --latency-live --latency \
    --budget-frac 1.0 --sample-frac 0.5         > /tmp/r4_5_latency.log 2>&1
python bench.py --torso --budget-frac 1.0      > /tmp/r4_10_nb5w_full.log 2>&1
echo R4 MEASURE2 DONE
