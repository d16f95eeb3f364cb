"""Optimized-HLO parsing for per-kernel roofline audits.

Parses the text from ``jax.stages.Compiled.as_text()`` into per-instruction
byte and MXU-flop accounting so traced device times can be placed on a
combined compute+bandwidth roofline (see ``benchmarks/fusion_bw_audit.py``
and ``docs/profiling.md`` §2). Dependency-free, like ``utils.xplane``.

The reference has no analysis tooling at all (SURVEY §5.1 — ad-hoc wall
timers only); this module is part of the framework's first-class profiling
story. Numbers derived here are estimates with known limits:

- ``kernel_bytes`` counts operand + output *buffer* sizes — donation/
  aliasing and partial reads (dynamic-slice) are not modeled;
- conv flops infer the contraction from ``rhs_elems / out_features``,
  which is exact for dense convs and overcounts grouped ones by the
  feature_group_count factor;
- flops inside nested (non-root) fusion calls are attributed to the inner
  computation only.
"""

import re
from typing import Dict, List, NamedTuple, Set

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}
_SHAPE_RE = re.compile(
    r"(pred|s8|u8|s16|u16|bf16|f16|s32|u32|f32|s64|u64|f64)\[([0-9,]*)\]"
)
INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([^\s=]+) = ")

_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([^\s]+) \(.*\) -> .* {")
_OP_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([^\s=]+) = (\(.*?\)|\S+) ([a-z][a-z0-9-]*)\((.*)$"
)
_CALLS_RE = re.compile(r"calls=%?([^\s,)]+)")
_WINDOW_RE = re.compile(r"window={size=([0-9x]+)")
_CONTRACTING_RE = re.compile(r"lhs_contracting_dims={([0-9,]+)}")


def shape_bytes(text: str) -> int:
    """Total bytes of every TYPE[dims] token in ``text`` (tuples sum;
    layout annotations like ``{3,0,2,1:T(8,128)}`` are ignored)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _n_elems(shape_text: str) -> int:
    n_total = 0
    for _, dims in _SHAPE_RE.findall(shape_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        n_total += n
    return n_total


class HloIndex(NamedTuple):
    """Per-instruction accounting over one optimized-HLO module."""

    out_bytes: Dict[str, int]       # instr name -> output buffer bytes
    operands: Dict[str, List[str]]  # instr name -> operand instr names
    opcode: Dict[str, str]          # instr name -> opcode
    body_of: Dict[str, str]         # fusion name -> called computation
    comp_ops: Dict[str, Set[str]]   # computation -> opcodes inside
    comp_flops: Dict[str, float]    # computation -> MXU flops inside

    def kernel_bytes(self, name: str) -> int:
        """Operand + output buffer bytes for one kernel (HBM traffic
        upper bound assuming every operand is read once)."""
        total = self.out_bytes.get(name, 0)
        for op in self.operands.get(name, ()):
            total += self.out_bytes.get(op, 0)
        return total

    def kernel_flops(self, name: str) -> float:
        """MXU flops inside a fusion kernel's body (0 for custom-calls,
        whose internals are opaque to HLO)."""
        return self.comp_flops.get(self.body_of.get(name, ""), 0.0)

    def has_mxu(self, name: str) -> bool:
        code = self.opcode.get(name, "")
        if code in ("dot", "convolution", "custom-call"):
            return True
        body = self.body_of.get(name)
        if body and self.comp_ops.get(body):
            return bool(self.comp_ops[body] & {"dot", "convolution"})
        return False


def parse_hlo(hlo: str) -> HloIndex:
    """Index an optimized-HLO module text (one instruction per line,
    computations delimited by ``{``/``}``)."""
    out_bytes: Dict[str, int] = {}
    operands: Dict[str, List[str]] = {}
    opcode: Dict[str, str] = {}
    body_of: Dict[str, str] = {}
    comp_ops: Dict[str, Set[str]] = {}
    comp_flops: Dict[str, float] = {}
    shape_of: Dict[str, str] = {}
    cur_comp = None

    for line in hlo.splitlines():
        m = _COMP_RE.match(line)
        if m:
            cur_comp = m.group(1)
            comp_ops.setdefault(cur_comp, set())
            comp_flops.setdefault(cur_comp, 0.0)
            continue
        m = _OP_RE.match(line)
        if not m:
            continue
        name, shape, code, rest = m.groups()
        out_bytes[name] = shape_bytes(shape)
        shape_of[name] = shape
        opcode[name] = code
        if cur_comp is not None:
            comp_ops[cur_comp].add(code)
        # operand names: %refs inside the first paren group (cut at the
        # first unbalanced close; attribute refs like calls= come after)
        depth = 1
        arglist = []
        for ch in rest:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            arglist.append(ch)
        operands[name] = re.findall(r"%([^\s,()]+)", "".join(arglist))
        if code == "fusion":
            mc = _CALLS_RE.search(rest)
            if mc:
                body_of[name] = mc.group(1)
        elif code in ("convolution", "dot") and cur_comp is not None:
            # MXU flops: 2 * out_elems * contraction size. For convs the
            # contraction is window * input features (inferred as
            # rhs_elems / out_features); for dots it is the product of
            # the lhs contracting dims.
            out_elems = _n_elems(shape)
            flops = 0.0
            ops_names = operands[name]
            if code == "convolution":
                mw = _WINDOW_RE.search(rest)
                if mw and len(ops_names) >= 2:
                    rhs_elems = _n_elems(shape_of.get(ops_names[1], ""))
                    mdims = _SHAPE_RE.search(shape)
                    if mdims and rhs_elems:
                        dims = [int(d) for d in mdims.group(2).split(",") if d]
                        out_f = dims[-1] if dims else 1
                        flops = 2.0 * out_elems * (rhs_elems / max(out_f, 1))
            else:
                mc2 = _CONTRACTING_RE.search(rest)
                if mc2 and ops_names:
                    mdims = _SHAPE_RE.search(shape_of.get(ops_names[0], ""))
                    if mdims:
                        dims = [int(d) for d in mdims.group(2).split(",") if d]
                        k = 1
                        for idx in mc2.group(1).split(","):
                            i = int(idx)
                            if i < len(dims):
                                k *= dims[i]
                        flops = 2.0 * out_elems * k
            comp_flops[cur_comp] = comp_flops.get(cur_comp, 0.0) + flops
    return HloIndex(out_bytes, operands, opcode, body_of, comp_ops,
                    comp_flops)
