"""Attribute a compiled workload's HBM traffic to instruction categories.

``cost_analysis()`` gives one total (and over-counts operands shared across
fused consumers — lsun128 measures FASTER than its nominal "floor");
this tool parses the optimized post-fusion HLO and buckets every
instruction's operand+output bytes by category (convolution, fusion kinds,
reduce, copy/transpose, all-reduce, ...), so "where do good64's 178 GB/iter
come from?" has a concrete answer that directs kernel work.

    python tools/hlo_breakdown.py --workload good64 [--remat] [--top 25]

Bytes here are the same accounting basis as cost_analysis (operands+outputs
of post-fusion instructions), so bucket percentages map directly onto the
roofline totals.
"""

from __future__ import annotations

import argparse
import collections
import json
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of one HLO shape string, incl. tuple members."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def categorize(kind: str, line: str) -> str:
    if kind == "fusion":
        m = re.search(r'kind=(\w+)', line)
        k = m.group(1) if m else "unknown"
        return f"fusion:{k}"
    if kind in ("convolution", "custom-call"):
        if "Conv" in line or kind == "convolution":
            return "convolution"
        return "custom-call"
    return kind


_SHAPE_LAYOUT_RE = re.compile(r"(\w+\[[\d,]*\])\{([^}]*)\}")


def _layout_perm(layout: str) -> str:
    """Dim-order part of an HLO layout, without tile/memory-space suffix."""
    return layout.split(":")[0]


def _in_hbm(layout: str) -> bool:
    """True when the buffer lives in HBM (no S(1)=VMEM / S(2)=SMEM tag)."""
    return "S(" not in layout


def hbm_bytes(out_shape: str) -> int:
    """Bytes of the HBM-resident members of one (possibly tuple) shape —
    S(1)/S(2)-tagged members live on-core and are not HBM traffic."""
    total = 0
    for shape, layout in _SHAPE_LAYOUT_RE.findall(out_shape):
        if _in_hbm(layout):
            total += shape_bytes(shape)
    # CPU dialect: shapes without any {layout} suffix are plain HBM/host
    if not _SHAPE_LAYOUT_RE.search(out_shape):
        total = shape_bytes(out_shape)
    return total


# shape group is non-greedy up to the opcode: TPU HLO appends layout/tile
# annotations like ``{3,2,1,0:T(8,128)(2,1)}`` that a character class can't
# enumerate (the round-3 chip run parsed 0 bytes because of exactly that)
_LINE_RE = re.compile(
    r"^(?:ROOT\s+)?(%?[\w.\-]+)\s*=\s*(.*?)\s+([\w\-]+)\((.*)$"
)


def breakdown(hlo_text: str):
    """bytes by category over executed-computation instructions.

    Region-aware: instructions inside fusion sub-computations and
    single-op wrapper computations are NOT counted (their interior traffic
    stays in registers/VMEM — the referencing top-level fusion instruction
    carries the HBM operand/output bytes).  ENTRY, while bodies, and scalar
    reducer regions ARE counted.

    Two passes: first map every instruction name to its output bytes and
    layout (optimized HLO prints operands as bare ``%name`` without shapes),
    then charge each counted instruction its output plus resolved operand
    bytes.  Also buckets by the leading jax op_name path segment from
    metadata for model-level attribution.

    Async memory-movement pairs get special accounting (the naive
    operands+outputs rule charged a copy-start's (dest, src, ctx) tuple AND
    its copy-done AND the resolved operand — ~3x the buffer, which is how
    the round-3 analysis misread memory-space prefetches as an 16.7%
    "layout copy" tax):

    * ``copy-start`` is charged only its HBM sides — a VMEM prefetch or
      spill moves the buffer across HBM once (categorized ``copy:memspace``,
      traffic it largely REPLACES elsewhere); an HBM->HBM copy twice —
      and categorized ``copy:layout-change`` when the dim orders differ.
      ``copy-done`` is the wait handle: charged 0.
    * ``async-start`` (e.g. ``slice-start`` DMA) is charged its result
      region per HBM side — a DMA slice only touches the sliced region,
      not the whole operand.  ``async-done`` is charged 0.
    * plain ``copy`` is split the same way via the producer's layout.

    Accounting is memory-space-aware throughout: outputs tagged
    ``S(1)``/``S(2)`` live in VMEM/SMEM (not HBM writes), and operands
    whose producer output is on-core are not HBM reads.
    """
    sizes: dict[str, int] = {}
    perms: dict[str, str] = {}
    counted: list[tuple[str, str, str]] = []  # (kind, line, args)
    in_skipped_block = False
    for line in hlo_text.splitlines():
        s = line.strip()
        if s.startswith("}"):
            in_skipped_block = False
            continue
        if s.endswith("{") and ("(" in s) and "=" not in s.split("(")[0]:
            name = s.split("(")[0].strip().lstrip("%")
            # async_computation bodies hold the inner op of an async pair
            # (e.g. the slice of a slice-start) — the async-start already
            # carries the charge, so counting the body double-counts it
            in_skipped_block = name.startswith(
                ("fused_computation", "wrapped_", "async_computation")
            )
            continue
        if not s or s.startswith(("HloModule", "ENTRY", "//")):
            continue
        m = _LINE_RE.match(s)
        if not m:
            continue
        name, out_shape, kind = m.group(1).lstrip("%"), m.group(2), m.group(3)
        sizes[name] = hbm_bytes(out_shape)
        sl = _SHAPE_LAYOUT_RE.findall(out_shape)
        if sl:
            perms[name] = _layout_perm(sl[0][1])
        if in_skipped_block or kind in (
            "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
            "copy-done", "async-done",
        ):
            continue
        counted.append((kind, s, m.group(4)))

    by_cat = collections.Counter()
    n_by_cat = collections.Counter()
    by_op_name = collections.Counter()
    heaviest: list[tuple[int, str]] = []
    for kind, s, args in counted:
        m = _LINE_RE.match(s)
        out_b = hbm_bytes(m.group(2))
        # operands: bare %name references before any attribute list
        arg_str = args.split("), ")[0] if "), " in args else args.split(")")[0]
        in_b = sum(
            sizes.get(om.group(1), 0)
            for om in re.finditer(r"%([\w.\-]+)", arg_str)
        )
        b = out_b + in_b
        cat = categorize(kind, s)
        members = _SHAPE_LAYOUT_RE.findall(m.group(2))
        if kind == "copy-start" and len(members) >= 2:
            dest, src = members[0], members[1]
            b = sum(shape_bytes(mm[0]) for mm in (dest, src) if _in_hbm(mm[1]))
            cat = ("copy:memspace"
                   if _layout_perm(dest[1]) == _layout_perm(src[1])
                   else "copy:layout-change")
        elif kind == "async-start" and len(members) >= 2:
            result = members[-2] if members[-1][0].endswith("[]") else members[-1]
            operand = members[0]
            b = shape_bytes(result[0]) * (
                int(_in_hbm(operand[1])) + int(_in_hbm(result[1]))
            )
            inner = m.group(1).lstrip("%").rsplit("-start", 1)[0].rsplit(".", 1)[0]
            cat = f"async:{inner}"
        elif kind in ("slice", "dynamic-slice"):
            # Same rule as async:slice — a slice reads only the sliced
            # REGION, not the whole operand (the naive operands+outputs
            # charge overstated good64's slice category ~2.5x, see
            # VALIDATION "good64 HLO byte attribution").  Charge the
            # region per HBM side: operand side if the producer's output
            # lives in HBM (in_b > 0), result side if the output does.
            region = shape_bytes(m.group(2))
            b = region * (int(in_b > 0) + int(out_b > 0))
        elif kind == "dynamic-update-slice":
            # In-place DUS traffic is the UPDATE region twice (read the
            # update operand, write the region), not the full destination
            # buffer.  The update is the second operand.
            ops = re.findall(r"%([\w.\-]+)", arg_str)
            upd = sizes.get(ops[1], 0) if len(ops) > 1 else 0
            b = upd + min(upd, out_b) if out_b else upd
        elif kind == "copy":
            op = re.search(r"copy\(%?([\w.\-]+)", s)
            src_perm = perms.get(op.group(1)) if op else None
            dst_perm = _layout_perm(members[0][1]) if members else None
            if src_perm and dst_perm:
                cat = ("copy:memspace" if src_perm == dst_perm
                       else "copy:layout-change")
        by_cat[cat] += b
        n_by_cat[cat] += 1
        om = re.search(r'op_name="([^"]+)"', s)
        if om:
            # leading segment of the jax op path, e.g. "jit(multi)/jvp(...)"
            seg = om.group(1).split("/")
            by_op_name["/".join(seg[1:3]) if len(seg) > 2 else om.group(1)] += b
        heaviest.append((b, s[:140]))
    heaviest.sort(reverse=True)
    return by_cat, n_by_cat, by_op_name, heaviest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="good64")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dump", default=None,
                    help="also write the optimized HLO text to this path "
                         "(gzip if it ends in .gz) for offline parsing")
    ap.add_argument("--options", default=None,
                    help="compiler options as flag=value,flag=value (e.g. a "
                         "layout_ab winning arm) applied to the compile")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax

    from ctgan_tpu.core import default_tpu_policy

    on_tpu = jax.devices()[0].platform != "cpu"
    default_tpu_policy(enable_bf16=on_tpu)
    if on_tpu:
        from ctgan_tpu.ops.dropout import enable_pallas_dropout

        enable_pallas_dropout(True)

    from cost_analysis import analyze, compile_workload

    overrides = {"remat": True} if args.remat else {}
    opts = None
    if args.options:
        from ctgan_tpu.core.compileopts import _parse_env

        opts = _parse_env(args.options)
        print(f"compiler options: {opts}")
    w, compiled = compile_workload(args.workload, tiny=args.tiny,
                                   compiler_options=opts, **overrides)
    summary = analyze(compiled, name=w.name)
    text = compiled.as_text()
    if args.dump:
        if args.dump.endswith(".gz"):
            import gzip

            with gzip.open(args.dump, "wt") as f:
                f.write(text)
        else:
            with open(args.dump, "w") as f:
                f.write(text)
        print(f"dumped {len(text)} chars of HLO to {args.dump}")
    by_cat, n_by_cat, by_op_name, heaviest = breakdown(text)
    total = sum(by_cat.values())
    print(json.dumps(summary))
    print(f"parsed bytes total: {total/1e9:.1f} GB "
          f"(cost_analysis: {summary['bytes_per_iter']/1e9:.1f} GB)")
    if total < 0.01 * summary["bytes_per_iter"]:
        # parse failure diagnostics: show the text dialect we didn't handle
        lines = text.splitlines()
        print(f"PARSE SUSPECT: {len(lines)} lines; first block headers + "
              "sample unmatched instruction lines follow")
        shown_h = shown_i = 0
        for line in lines:
            s = line.strip()
            if shown_h < 8 and s.endswith("{"):
                print("  HDR:", s[:200])
                shown_h += 1
            elif shown_i < 12 and "=" in s and "(" in s and not _LINE_RE.match(s):
                print("  UNMATCHED:", s[:200])
                shown_i += 1
            if shown_h >= 8 and shown_i >= 12:
                break
    for cat, b in by_cat.most_common():
        print(f"  {cat:28s} {b/1e9:9.2f} GB  {100*b/max(total,1):5.1f}%  "
              f"n={n_by_cat[cat]}")
    print("by jax op_name prefix:")
    for name, b in by_op_name.most_common(args.top):
        print(f"  {b/1e9:9.2f} GB  {100*b/max(total,1):5.1f}%  {name}")
    print("heaviest instructions:")
    for b, s in heaviest[: args.top]:
        print(f"  {b/1e6:10.1f} MB  {s}")


if __name__ == "__main__":
    main()
