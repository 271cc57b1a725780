#!/bin/bash
# TPU-recovery autopilot (single serialized TPU pipeline):
#   1. poll backend health (bounded fresh jit) every POLL_S;
#   2. on recovery, run the fern-scale phase probe (probe_train_stall.py);
#   3. pick the soak scene from the measured warm step time
#      (<= 20 ms/step -> the fern operating point, else the tiny scene);
#   4. launch the resumable full-schedule soak.
# All state lands in /tmp/autopilot/: health.txt, probe.txt, soak.log,
# done markers. Never runs two TPU processes at once.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/autopilot
mkdir -p "$OUT"
POLL_S="${POLL_S:-480}"

note() { echo "[autopilot $(date -u +%FT%TZ)] $*" | tee -a "$OUT/log.txt"; }

note "start (poll every ${POLL_S}s)"
while true; do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda x: (x*1.000421+0.33).sum())(jnp.arange(7801.0))
print('ok', float(x))
" > "$OUT/health.txt" 2>&1; then
    note "TPU is back: $(tail -1 "$OUT/health.txt")"
    break
  fi
  note "TPU still down"
  sleep "$POLL_S"
done

note "running fern-scale phase probe"
timeout 2700 python scripts/probe_train_stall.py 504x378x17 10 \
  > "$OUT/probe.txt" 2>&1
note "probe exit=$? (see $OUT/probe.txt)"

MS=$(python - <<'EOF'
import json
ms = None
try:
    for line in open("/tmp/autopilot/probe.txt"):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if "ms_per_step" in d:
                ms = d["ms_per_step"]
except Exception:
    pass
print(ms if ms is not None else 9999)
EOF
)
note "measured warm fern-scale step: ${MS} ms"
SPEC=synthetic
AWKOK=$(python -c "print(1 if float('${MS}') <= 20 else 0)")
if [ "$AWKOK" = "1" ]; then SPEC="synthetic:504x378x17"; fi
note "launching soak with SOAK_SPEC=$SPEC"
echo "$SPEC" > "$OUT/soak_spec.txt"
SOAK_SPEC="$SPEC" bash scripts/soak_fern_schedule.sh \
  > "$OUT/soak.log" 2>&1
note "soak script exited rc=$? -- see $OUT/soak.log"
touch "$OUT/soak_done"
