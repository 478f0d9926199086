"""HLO-text byte-attribution parser (tools/hlo_breakdown.py).

The parser must handle BOTH HLO text dialects: CPU (plain ``f32[64,64]``
shapes) and TPU (layout/tile annotations ``{1,0:T(8,128)(2,1)}`` appended
to every shape — the round-3 chip run initially parsed 0 bytes because the
line regex rejected them).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from hlo_breakdown import breakdown, shape_bytes  # noqa: E402

TPU_TEXT = """\
HloModule jit_step, entry_computation_layout={(bf16[64,128]{1,0:T(8,128)(2,1)})->bf16[64,64]{1,0:T(8,128)(2,1)}}

%fused_computation.1 (param_0.1: bf16[64,128], param_1.2: bf16[128,64]) -> bf16[64,64] {
  %param_0.1 = bf16[64,128]{1,0:T(8,128)(2,1)} parameter(0)
  %param_1.2 = bf16[128,64]{1,0:T(8,128)(2,1)} parameter(1)
  %mul.9 = bf16[64,128]{1,0:T(8,128)(2,1)} multiply(%param_0.1, %param_0.1)
  ROOT %dot.3 = bf16[64,64]{1,0:T(8,128)(2,1)} dot(%mul.9, %param_1.2), lhs_contracting_dims={1}, rhs_contracting_dims={0}
}

%region_0.7 (lhs: bf16[], rhs: bf16[]) -> bf16[] {
  %lhs = bf16[]{:T(256)} parameter(0)
  %rhs = bf16[]{:T(256)} parameter(1)
  ROOT %add.1 = bf16[]{:T(256)} add(%lhs, %rhs)
}

ENTRY %main.42 (p0.1: bf16[64,128], p1.2: bf16[128,64]) -> bf16[64,64] {
  %p0.1 = bf16[64,128]{1,0:T(8,128)(2,1)} parameter(0)
  %p1.2 = bf16[128,64]{1,0:T(8,128)(2,1)} parameter(1)
  %fusion.1 = bf16[64,64]{1,0:T(8,128)(2,1)} fusion(%p0.1, %p1.2), kind=kOutput, calls=%fused_computation.1, metadata={op_name="jit(step)/jvp(model)/dot_general"}
  %convolution.5 = bf16[64,64]{1,0:T(8,128)(2,1)} convolution(%fusion.1, %p1.2), window={size=1x1}, dim_labels=bf01_oi01->bf01, metadata={op_name="jit(step)/jvp(model)/conv"}
  ROOT %copy.2 = bf16[64,64]{1,0:T(8,128)(2,1)} copy(%convolution.5)
}
"""


def test_shape_bytes_with_tpu_layout():
    assert shape_bytes("bf16[64,128]{1,0:T(8,128)(2,1)}") == 64 * 128 * 2
    assert shape_bytes("f32[10]") == 40
    assert shape_bytes("(bf16[4]{0:T(256)}, s32[2]{0:T(256)})") == 8 + 8


def test_breakdown_counts_entry_not_fusion_interior():
    by_cat, n_by_cat, by_op_name, heaviest = breakdown(TPU_TEXT)
    total = sum(by_cat.values())
    assert total > 0, "TPU-dialect text must parse (round-3 regression)"
    # fusion: out 64*64*2 + operands (64*128 + 128*64)*2
    fusion_b = 64 * 64 * 2 + 2 * (64 * 128 * 2)
    assert by_cat["fusion:kOutput"] == fusion_b
    # interior %mul.9 / %dot.3 must NOT be counted as instructions
    assert "multiply" not in by_cat and "dot" not in by_cat
    # the scalar reducer region IS counted but contributes ~nothing
    assert by_cat.get("add", 0) <= 8
    assert n_by_cat["convolution"] == 1
    # op_name attribution picked up the jax paths
    assert any("jvp(model)" in k for k in by_op_name)
    # parameters/constants excluded
    assert "parameter" not in by_cat
    assert heaviest[0][0] == fusion_b


# Verbatim instruction forms from the first hardware-validated dump
# (runs/hlo_resnet_r3.txt.gz, round 3): async copy pairs with tuple shapes
# and S(1)/S(2) memory-space annotations, reduce with a to_apply region,
# custom-call with operand_layout_constraints.
TPU_REAL_FORMS = """\
HloModule jit_step_fn

%reduce_or_computation.63 (x.1: u32[], y.1: u32[]) -> u32[] {
  %x.1 = u32[]{:T(256)} parameter(0)
  %y.1 = u32[]{:T(256)} parameter(1)
  ROOT %or.1 = u32[]{:T(256)} or(%x.1, %y.1)
}

ENTRY %main.476 (p0.1: u32[256,8,32,128], p1.1: s32[1024]) -> s32[128] {
  %p0.1 = u32[256,8,32,128]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %p1.1 = s32[1024]{0:T(1024)} parameter(1)
  %shift-left.192 = u32[256,8,32,128]{3,0,2,1:T(8,128)(2,1)} shift-left(%p0.1, %p0.1)
  %reduce.627 = u32[256,32,128]{2,0,1:T(8,128)} reduce(%shift-left.192, %p1.1), dimensions={1}, to_apply=%reduce_or_computation.63
  %custom-call.5 = s32[1024]{0:T(1024)} custom-call(%p1.1), custom_call_target="AssumeGatherIndicesInBound", operand_layout_constraints={s32[1024]{0:T(1024)}}, metadata={op_name="jit(step_fn)/jvp(disc)/gather"}
  %broadcast_add_fusion.8 = u32[128]{0:T(128)} fusion(%custom-call.5), kind=kLoop, calls=%reduce_or_computation.63
  %copy-start.623 = (u32[128]{0:T(128)}, u32[128]{0:T(128)S(1)}, u32[]{:S(2)}) copy-start(%broadcast_add_fusion.8)
  ROOT %copy-done.617 = s32[128]{0:T(128)} copy-done(%copy-start.623)
}
"""


def test_breakdown_real_tpu_forms():
    by_cat, n_by_cat, by_op_name, heaviest = breakdown(TPU_REAL_FORMS)
    total = sum(by_cat.values())
    assert total > 0
    # reduce: out 256*32*128*4 + operands (256*8*32*128*4 + 1024*4)
    assert by_cat["reduce"] == 256 * 32 * 128 * 4 + 256 * 8 * 32 * 128 * 4 + 1024 * 4
    # async copy pair: same dim order, S(1) memory space only -> a VMEM
    # spill/prefetch crosses HBM ONCE (only the HBM-side tuple member is
    # charged at copy-start; the S(1)/S(2) members are on-core); -done is
    # the wait handle (charged 0) — the old operands+outputs rule charged
    # ~3x and produced the withdrawn "16.7% layout copies" misattribution
    assert by_cat["copy:memspace"] == 128 * 4
    assert "copy-start" not in by_cat
    assert "copy-done" not in by_cat
    # custom-call parses despite operand_layout_constraints shapes in attrs
    assert n_by_cat["custom-call"] == 1
    assert any("jvp(disc)" in k for k in by_op_name)


# The corrected copy taxonomy (round-3 session 4): plain copies split by
# whether the dim order actually changes; async-start DMA slices charged by
# their result region, not the whole operand tuple.
COPY_TAXONOMY = """\
HloModule jit_copies

ENTRY %main.1 (p0: bf16[8,4,4,16]) -> bf16[8,4,4,16] {
  %p0 = bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %copy.1 = bf16[8,4,4,16]{0,3,2,1:T(8,128)(2,1)} copy(%p0)
  %copy.2 = bf16[8,4,4,16]{0,3,2,1:T(8,128)(2,1)S(1)} copy(%copy.1)
  %slice-start.3 = ((bf16[8,4,4,16]{0,3,2,1:T(8,128)(2,1)}), bf16[8,1,4,16]{0,3,2,1:T(8,128)(2,1)S(1)}, s32[]{:S(2)}) async-start(%copy.2), calls=%async_computation.3
  %slice-done.3 = bf16[8,1,4,16]{0,3,2,1:T(8,128)(2,1)S(1)} async-done(%slice-start.3)
  ROOT %copy.3 = bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)} copy(%copy.2)
}
"""


def test_breakdown_copy_taxonomy():
    by_cat, n_by_cat, _, _ = breakdown(COPY_TAXONOMY)
    buf = 8 * 4 * 4 * 16 * 2  # bf16 bytes
    # copy.1 {3,0,2,1}->{0,3,2,1} and copy.3 back: genuine layout changes.
    # Accounting is memory-space-aware: copy.1 reads+writes HBM (2x buf),
    # but copy.3's operand (copy.2) lives in VMEM, so only its HBM write
    # is charged (1x buf)
    assert by_cat["copy:layout-change"] == 2 * buf + buf
    assert n_by_cat["copy:layout-change"] == 2
    # copy.2 changes only the S(1) memory space: not a layout change, and
    # only its HBM-side read is charged (the S(1) write is on-core)
    assert by_cat["copy:memspace"] == buf
    # the async DMA slice is charged its RESULT region (1/4 the rows) per
    # HBM side — here one HBM read, an S(1) result write; -done is free
    assert by_cat["async:slice"] == 8 * 1 * 4 * 16 * 2
    assert "async-start" not in by_cat and "async-done" not in by_cat


# Sync slices follow the async-slice rule (round 4): a slice reads only
# the sliced REGION, not its whole operand — the operands+outputs charge
# overstated good64's compiler-generated spatial-chunk slices ~2.5x.
SYNC_SLICE = """\
HloModule jit_slices

ENTRY %main.1 (p0: bf16[8,4,4,16]) -> bf16[8,1,4,16] {
  %p0 = bf16[8,4,4,16]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %slice.1 = bf16[8,1,4,16]{3,2,1,0:T(8,128)(2,1)} slice(%p0), slice={[0:8], [0:1], [0:4], [0:16]}
  %copy.v = bf16[8,4,4,16]{3,2,1,0:T(8,128)(2,1)S(1)} copy(%p0)
  %slice.2 = bf16[8,1,4,16]{3,2,1,0:T(8,128)(2,1)} slice(%copy.v), slice={[0:8], [1:2], [0:4], [0:16]}
  %iota.1 = s32[]{:S(2)} iota(), iota_dimension=0
  %dus.1 = bf16[8,4,4,16]{3,2,1,0:T(8,128)(2,1)} dynamic-update-slice(%p0, %slice.1, %iota.1, %iota.1, %iota.1, %iota.1)
  ROOT %slice.3 = bf16[8,1,4,16]{3,2,1,0:T(8,128)(2,1)S(1)} slice(%p0), slice={[0:8], [2:3], [0:4], [0:16]}
}
"""


def test_breakdown_sync_slice_region_accounting():
    by_cat, n_by_cat, _, _ = breakdown(SYNC_SLICE)
    region = 8 * 1 * 4 * 16 * 2  # bf16 bytes of the sliced region
    # slice.1: HBM operand + HBM out -> 2 regions; slice.2: VMEM operand
    # (copy.v is S(1)) + HBM out -> 1 region; slice.3: HBM operand + S(1)
    # out -> 1 region.  NEVER the full [8,4,4,16] operand.
    assert by_cat["slice"] == 4 * region
    assert n_by_cat["slice"] == 3
    # dynamic-update-slice: the update region twice (read update + write
    # region in place), not the full destination buffer
    assert by_cat["dynamic-update-slice"] == 2 * region
