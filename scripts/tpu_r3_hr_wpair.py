"""Round-3: A/B the PAIRWISE W projection on the hr static driver's WIDE
trailing updates (square_hr._W_PAIR_MAX_COLS lifted to cover every width).

Post-V1 state (tpu_r3_hr.py big, after commit be6d354): 16384^2 static hr =
235.84 ms / 24.86 TFLOP/s, relerr 1.01e-06 — pairwise grams alone leave the
update-projection (V2) term, a hair over the 1e-6 gate. The probe's V3
(pairwise grams + pairwise W) measured 5.41e-07 at 8192^2; production cost
of the wide pairwise W is ~2*nblk*nb/(3*m) extra HBM on the update phase
(~4-6% predicted). If relerr lands comfortably under 1e-6 at an acceptable
wall cost, _W_PAIR_MAX_COLS flips to unlimited and the static hr driver
becomes acceptance-grade at ~24 TFLOP/s.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import tileqr.drivers.square_hr as shr  # noqa: E402

shr._W_PAIR_MAX_COLS = 1 << 30  # pairwise W at EVERY width

from tpu_r3_hr import bench  # noqa: E402

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "16k"
    if which == "16k":
        bench(16384, 256, check=True, chain_k=2)
    elif which == "8k":
        bench(8192, 256, check=True)
