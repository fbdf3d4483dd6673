#!/usr/bin/env python
"""CLAP fused stage-0 kernel (mel + bicubic interp + bn0): built and REJECTED.

Motivation: the XLA interp pass standalone measures ~1.6 ms at B=32 in
EITHER form (dense einsum or 4-tap gather — exp_clap_stage0.py), so a
kernel that emits bn0'd interp'd [B, 1024, 64] straight from the waveform
looked like the last CLAP win. The kernel below extends the accepted
fused_pann_logmel chain with a per-tile banded interp matmul: output tiles
of 128 interp'd frames, tile starts at the affine 120*o against an 8-row
front-shifted source (Mosaic must PROVE Element starts sublane-divisible —
the natural 125*o - 1 starts fail with "Couldn't prove that tiling (8)
divides index"), window 184 to absorb the 5*o + 7 slack, band weights
sliced host-side from the dense bicubic matrix (fp-equivalent; interpret
parity vs the XLA mel -> tap4 -> bn0 composition passed at 2e-4).

Measured (this file, v5e, B=32 bf16, 12 iters x 3 interleaved reps):

    old (pallas mel kernel + in-model tap4 interp) : 13.04-13.61 ms
    new (fused stage-0 kernel + clap body)         : 14.02-14.66 ms

REJECT (-5%): the widened overlapping windows recompute 8 x 184 = 1472 mel
rows where the plain mel kernel computes ~1088 (47% extra DFT work), which
costs more than the saved XLA interp pass (whose in-context cost is far
below its 1.6 ms standalone reading — the stage0 slice is fusion-shared,
same lesson as the round-3 einsum-reformulation rejection). A 256-row tile
would cut the overlap to ~22% but projects to parity at best. Numerics
were fine (mean-emb delta 5.5e-5).

The full working implementation (kernel + clap_forward_from_bn0 split +
pipeline/bench wiring + interpret test) is preserved as a tracked patch:
scripts/patches/clap_stage0_kernel.patch (applies cleanly to the commit
that added this script).

Usage: python scripts/exp_clap_stage0_kernel.py   # prints the record above
"""

print(__doc__)
