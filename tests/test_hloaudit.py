"""utils.hloaudit: optimized-HLO parsing for per-kernel roofline audits.

Validated against a real XLA:CPU-compiled program (not a text fixture) so
the parser tracks the printer format jaxlib actually emits, plus a
hand-written fixture for the flop formulas (CPU HLO may fold/rename ops).
"""

import jax
import jax.numpy as jnp
import pytest

from stable_diffusion_training_tpu.utils import hloaudit


class TestShapeBytes:
    def test_simple(self):
        assert hloaudit.shape_bytes("bf16[16,64,64,320]{3,2,1,0}") == (
            16 * 64 * 64 * 320 * 2
        )

    def test_tuple_sums(self):
        text = "(f32[16,128]{1,0}, s8[4,128]{1,0})"
        assert hloaudit.shape_bytes(text) == 16 * 128 * 4 + 4 * 128

    def test_layout_annotations_ignored(self):
        # tiling/memory-space annotations must not be parsed as dims
        assert hloaudit.shape_bytes(
            "f32[16,128]{1,0:T(8,128)S(1)}"
        ) == 16 * 128 * 4

    def test_scalar(self):
        assert hloaudit.shape_bytes("f32[]") == 4


class TestParseRealProgram:
    @pytest.fixture(scope="class")
    def index(self):
        @jax.jit
        def f(x, w, a, b):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            z = a @ b
            return jnp.sum(y) + jnp.sum(z)

        x = jnp.zeros((2, 8, 8, 16), jnp.float32)
        w = jnp.zeros((3, 3, 16, 16), jnp.float32)
        a = jnp.zeros((32, 64), jnp.float32)
        b = jnp.zeros((64, 48), jnp.float32)
        hlo = jax.jit(f).lower(x, w, a, b).compile().as_text()
        return hloaudit.parse_hlo(hlo), hlo

    def test_instructions_found(self, index):
        idx, hlo = index
        assert len(idx.out_bytes) > 3
        # every parsed instruction has an opcode and bytes entry
        assert set(idx.opcode) == set(idx.out_bytes)

    def test_mxu_flops_found(self, index):
        idx, hlo = index
        # conv (2*B*OH*OW*Cout*KH*KW*Cin) + dot (2*M*N*K) flops must be
        # attributed to some computation, wherever XLA placed them
        conv_flops = 2.0 * 2 * 8 * 8 * 16 * (3 * 3 * 16)
        dot_flops = 2.0 * 32 * 48 * 64
        total = sum(idx.comp_flops.values())
        assert total == pytest.approx(conv_flops + dot_flops, rel=1e-6), (
            total, conv_flops, dot_flops)

    def test_operand_bytes_resolve(self, index):
        idx, hlo = index
        # the kernel containing the conv must charge at least input+weights
        name = next(
            n for n, code in idx.opcode.items()
            if code == "convolution"
            or (code == "fusion"
                and "convolution" in idx.comp_ops.get(
                    idx.body_of.get(n, ""), ()))
        )
        assert idx.kernel_bytes(name) >= 2 * 8 * 8 * 16 * 4

    def test_has_mxu(self, index):
        idx, hlo = index
        mxu_kernels = [n for n in idx.opcode if idx.has_mxu(n)]
        assert mxu_kernels


class TestFixtureFormulas:
    HLO = """\
HloModule m

%fused_computation.1 (p0: f32[4,10,10,8], p1: f32[3,3,8,16]) -> f32[4,10,10,16] {
  %p0 = f32[4,10,10,8]{3,2,1,0} parameter(0)
  %p1 = f32[3,3,8,16]{3,2,1,0} parameter(1)
  ROOT %conv = f32[4,10,10,16]{3,2,1,0} convolution(%p0, %p1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}

ENTRY %main (a: f32[4,10,10,8], b: f32[3,3,8,16], c: f32[8,32], d: f32[32,16]) -> f32[] {
  %a = f32[4,10,10,8]{3,2,1,0} parameter(0)
  %b = f32[3,3,8,16]{3,2,1,0} parameter(1)
  %c = f32[8,32]{1,0} parameter(2)
  %d = f32[32,16]{1,0} parameter(3)
  %fusion.1 = f32[4,10,10,16]{3,2,1,0} fusion(%a, %b), kind=kOutput, calls=%fused_computation.1
  %dot.1 = f32[8,16]{1,0} dot(%c, %d), lhs_contracting_dims={1}, rhs_contracting_dims={0}
  ROOT %r = f32[] constant(0)
}
"""

    def test_conv_flops(self):
        idx = hloaudit.parse_hlo(self.HLO)
        want = 2.0 * (4 * 10 * 10 * 16) * (3 * 3 * 8)
        assert idx.comp_flops["fused_computation.1"] == pytest.approx(want)
        assert idx.kernel_flops("fusion.1") == pytest.approx(want)
        assert idx.has_mxu("fusion.1")

    def test_dot_flops(self):
        idx = hloaudit.parse_hlo(self.HLO)
        want = 2.0 * (8 * 16) * 32
        assert idx.comp_flops["main"] == pytest.approx(want)
        assert idx.has_mxu("dot.1")

    def test_fusion_body_mapping(self):
        idx = hloaudit.parse_hlo(self.HLO)
        assert idx.body_of["fusion.1"] == "fused_computation.1"
        assert idx.opcode["fusion.1"] == "fusion"
        assert "convolution" in idx.comp_ops["fused_computation.1"]

    def test_kernel_bytes(self):
        idx = hloaudit.parse_hlo(self.HLO)
        in_b = 4 * 10 * 10 * 8 * 4 + 3 * 3 * 8 * 16 * 4
        out_b = 4 * 10 * 10 * 16 * 4
        assert idx.kernel_bytes("fusion.1") == in_b + out_b

    def test_non_mxu(self):
        idx = hloaudit.parse_hlo(self.HLO)
        assert not idx.has_mxu("a")
