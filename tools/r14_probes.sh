#!/bin/bash
# Round-14 post-sweep probe sequence (run sequentially, one Spark at a
# time — the box-protocol rule).  Outputs land in /tmp/r14_*.
set -x
cd /root/repo

# 1. sf1.0 spot-check of the rows whose registration changed this round
SPARK_GRAFT_ORACLE_TIMEOUT=600 SPARK_GRAFT_DUCK_MEM=40GB \
SPARK_GRAFT_DUCK_TMP=/root/repo/.ducktmp \
  python tools/check_correctness.py testdata_sf1.0 \
  --queries cosine_lsh_prod,cep_decision_invariant,lsh_recall_floor,semdedup_flags \
  > /tmp/r14_sf1_spot.log 2>&1

# 2. CEP relational decade re-run at HEAD (r13 verdict task 6)
STROM_SPARK_DRIVER_MEM=64g python tools/scale_probe.py cep_decade \
  > /tmp/r14_cep_decade.log 2>&1

# 3. Decade-3: sf10 -> sf100 documents corpus (5M docs), the minhash
#    auto-banding + exact-dedup walls question (r13 verdict task 2)
SPARK_GRAFT_DECADE2_QUERIES=dedup_exact,dedup_minhash_lsh \
STROM_SPARK_DRIVER_MEM=64g \
  python tools/scale_probe.py decade2 testdata_sf10 testdata_sf100_docs \
  > /tmp/r14_decade3.log 2>&1

# 4. StreamingExactDedup state at 5M docs (decade-3 streaming state)
SPARK_GRAFT_STREAMING_ONLY=streaming_exact_dedup \
STROM_SPARK_DRIVER_MEM=64g \
  python tools/scale_probe.py streaming_decade testdata_sf100_docs \
  > /tmp/r14_streaming_sf100.log 2>&1

echo R14_PROBES_DONE
