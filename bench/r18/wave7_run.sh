#!/bin/bash
# r18 sf10 gate wave 7 (r17 verdict task 3): 8 more small-output
# aggregate heads, chosen by the wave-6 marginal-cost rule — oracles are
# single-scan aggregates DuckDB runs in seconds at sf10, Spark outputs
# are tiny. Run AFTER the anchor sweep (never concurrent with timing).
set -e
cd /root/repo
QS="tpch_q19_disjunctive tpch_q22_global_sales tpch_q16_supplier_cnt dq_histogram olap_group_mode trend_seasonal_anomaly sketch_quantile_rollup dq_profile_drift"
SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.Verify 8g target/sf10 target/verify_sf10_w7 $QS 2>/tmp/wave7_verify.log
python3 tools/check.py --json /tmp/wave7_check.json target/verify_sf10_w7 target/sf10 $QS
