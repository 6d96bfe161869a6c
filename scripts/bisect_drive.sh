#!/bin/bash
# Drive bisect_compose variants, probing TPU health between runs so a worker
# crash in one variant cannot poison the next. Usage: bisect_drive.sh v1 v2 ...
cd "$(dirname "$0")/.." || exit 1
# append, never clobber: the TPU backend plugin itself rides PYTHONPATH
# (e.g. /root/.axon_site) — replacing it silently demotes every probe and
# variant run to "no backend"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

probe_tpu() {
  for i in $(seq 1 20); do
    if timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; import jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" 2>/dev/null; then
      return 0
    fi
    echo "  tpu not healthy yet (probe $i); sleeping 30s" >&2
    sleep 30
  done
  return 1
}

for v in "$@"; do
  echo "=== variant $v ==="
  if ! probe_tpu; then echo "RESULT $v: TPU-UNAVAILABLE"; continue; fi
  if timeout 900 python scripts/bisect_compose.py --variant "$v" 2>/tmp/bisect_err.log; then
    echo "RESULT $v: PASS"
  else
    echo "RESULT $v: FAIL (rc=$?)"
    tail -3 /tmp/bisect_err.log | sed 's/^/    /'
  fi
done
