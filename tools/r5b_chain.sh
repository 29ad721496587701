#!/bin/bash
# Round-5 continuation: regenerate the 598-AO production artifacts that
# live outside git (cache/ is wiped between rounds), then profile.
# Each stage is cheap to re-enter (disk caches make restarts resumable);
# retry.sh handles the rc=7 wedge/arena contract.
set -x
cd /root/repo
tools/retry.sh 5 python tools/run_ttm_dzp_xtda.py ttm_vacuum \
  >> logs/r5b_xtda_ttm_dzp.log 2>&1 || exit 1
tools/retry.sh 3 python tools/profile_dzp_sigma.py ttm_vacuum dzp \
  >> logs/r5b_profile_ttm_dzp.log 2>&1
echo "chain done"
