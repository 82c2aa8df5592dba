#!/bin/bash
# Full five-mode gait-band sweep of a BBC checkpoint on the CPU backend
# (no chip contention with a live campaign).  Usage:
#   bash tools/gait_sweep.sh <checkpoint.msgpack> [out.txt]
CKPT=${1:?checkpoint path}
OUT=${2:-/dev/stdout}
{
for spec in walk:0.4 pace:1.0 trot:1.0 canter:1.5 jump:1.2; do
  m=${spec%%:*}; vx=${spec##*:}
  echo "=== mode $m vx $vx ==="
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu AGILITY_ENGINE=vmap \
  python -m agility_tpu.cli.play_bbc \
    --checkpoint "$CKPT" --mode "$m" --vx "$vx" --num_envs 8 --steps 300 \
    --mocap_dir /root/reference/bbc/mocap_data \
    --gait_bands agility_tpu/assets/gait_bands_real.json 2>/dev/null | tail -7
done
} | tee "$OUT"
