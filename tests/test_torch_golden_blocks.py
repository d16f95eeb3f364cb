"""Torch-golden numerics tests for the UNet/VAE building blocks.

The reference's denoiser and VAE ARE HuggingFace diffusers Flax models
(``/root/reference/training_utils.py:209-222``), so the parity bar for our
native models is diffusers numerics. diffusers itself is not installable in
this image, but torch is: each test hand-assembles the equivalent block from
``torch.nn`` primitives following the diffusers torch architecture — same
layer names, same math — transfers weights through
``hf_io.flax_params_to_torch_state_dict`` with ``strict=True`` (locking
name/layout compatibility with real diffusers checkpoints), and asserts fp32
forward parity on random weights and inputs.

GELU note: the reference stack is diffusers' *Flax* UNet, whose GEGLU uses
``jax.nn.gelu``'s default tanh approximation, so the torch modules here use
``approximate="tanh"`` to match that reference semantics (torch diffusers
uses erf-exact gelu — an upstream flax/torch divergence, not ours).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from stable_diffusion_training_tpu.models import (  # noqa: E402
    AutoencoderKL,
    UNet2DConditionModel,
    configs,
)
from stable_diffusion_training_tpu.models.blocks import (  # noqa: E402
    ResnetBlock2D,
    Upsample2D,
)
from stable_diffusion_training_tpu.models.attention import (  # noqa: E402
    Transformer2DModel,
)
from stable_diffusion_training_tpu.models.vae import VaeMidBlock  # noqa: E402
from stable_diffusion_training_tpu.models.hf_io import (  # noqa: E402
    flax_params_to_torch_state_dict,
)


# --- torch equivalents of the diffusers block architecture -------------------


class TorchResnetBlock2D(tnn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = tnn.Linear(temb_ch, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = tnn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return h + x


class TorchAttention(tnn.Module):
    def __init__(self, query_dim, heads, dim_head, context_dim=None):
        super().__init__()
        inner = heads * dim_head
        context_dim = context_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = tnn.Linear(query_dim, inner, bias=False)
        self.to_k = tnn.Linear(context_dim, inner, bias=False)
        self.to_v = tnn.Linear(context_dim, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, sq, _ = x.shape
        sk = context.shape[1]
        q = self.to_q(x).view(b, sq, self.heads, self.dim_head)
        k = self.to_k(context).view(b, sk, self.heads, self.dim_head)
        v = self.to_v(context).view(b, sk, self.heads, self.dim_head)
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) * self.dim_head**-0.5
        w = logits.softmax(dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, sq, -1)
        return self.to_out[0](o)


class TorchGEGLU(tnn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.proj = tnn.Linear(dim, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate, approximate="tanh")


class TorchFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        # net.0 / net.2 indices match diffusers (net.1 is a paramless Dropout)
        self.net = tnn.ModuleList(
            [TorchGEGLU(dim, dim * mult), tnn.Identity(), tnn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class TorchBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, dim_head, context_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TorchAttention(dim, heads, dim_head)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TorchAttention(dim, heads, dim_head, context_dim=context_dim)
        self.norm3 = tnn.LayerNorm(dim, eps=1e-5)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, context):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        return self.ff(self.norm3(x)) + x


class TorchTransformer2DModel(tnn.Module):
    def __init__(
        self, in_ch, heads, dim_head, context_dim, depth=1, use_linear_projection=False
    ):
        super().__init__()
        inner = heads * dim_head
        self.use_linear_projection = use_linear_projection
        self.norm = tnn.GroupNorm(32, in_ch, eps=1e-6)
        if use_linear_projection:
            self.proj_in = tnn.Linear(in_ch, inner)
            self.proj_out = tnn.Linear(inner, in_ch)
        else:
            self.proj_in = tnn.Conv2d(in_ch, inner, 1)
            self.proj_out = tnn.Conv2d(inner, in_ch, 1)
        self.transformer_blocks = tnn.ModuleList(
            [
                TorchBasicTransformerBlock(inner, heads, dim_head, context_dim)
                for _ in range(depth)
            ]
        )

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x)
        if self.use_linear_projection:
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
            x = self.proj_in(x)
        else:
            x = self.proj_in(x)
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, -1)
        for block in self.transformer_blocks:
            x = block(x, context)
        if self.use_linear_projection:
            x = self.proj_out(x)
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            x = x.reshape(b, h, w, -1).permute(0, 3, 1, 2)
            x = self.proj_out(x)
        return x + residual


class TorchDownsample2D(tnn.Module):
    def __init__(self, ch, asymmetric_padding=False):
        super().__init__()
        self.asymmetric = asymmetric_padding
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=0 if asymmetric_padding else 1)

    def forward(self, x):
        if self.asymmetric:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TorchUpsample2D(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TorchVaeAttentionBlock(tnn.Module):
    """diffusers 0.21.4-era VAE mid-block attention (single head,
    query/key/value/proj_attn naming)."""

    def __init__(self, ch):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, ch, eps=1e-6)
        self.query = tnn.Linear(ch, ch)
        self.key = tnn.Linear(ch, ch)
        self.value = tnn.Linear(ch, ch)
        self.proj_attn = tnn.Linear(ch, ch)

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        x = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.query(x), self.key(x), self.value(x)
        weights = (q @ k.transpose(1, 2) * c**-0.5).softmax(dim=-1)
        x = self.proj_attn(weights @ v)
        return x.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


def _load(torch_module, flax_params):
    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in flax_params_to_torch_state_dict(flax_params).items()
    }
    torch_module.load_state_dict(sd, strict=True)
    return torch_module.eval()


def _nchw(x):
    return torch.tensor(np.asarray(jnp.transpose(x, (0, 3, 1, 2))))


def _assert_close(ours_nhwc, theirs_nchw, atol):
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(ours_nhwc, (0, 3, 1, 2))),
        theirs_nchw.detach().numpy(),
        atol=atol,
        rtol=1e-4,
    )


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(7)


class TestBlockParity:
    def test_resnet_block(self, rng):
        """ResnetBlock2D w/ channel change + time embedding vs torch."""
        block = ResnetBlock2D(out_channels=64)
        x = jax.random.normal(rng, (2, 8, 8, 32))
        temb = jax.random.normal(jax.random.fold_in(rng, 1), (2, 48))
        params = block.init(rng, x, temb)["params"]
        tb = _load(TorchResnetBlock2D(32, 64, temb_ch=48), params)
        ours = block.apply({"params": params}, x, temb)
        theirs = tb(_nchw(x), torch.tensor(np.asarray(temb)))
        _assert_close(ours, theirs, atol=1e-5)

    def test_transformer2d_conv_projection(self, rng):
        """SD1.5-style spatial transformer (1x1-conv in/out) vs torch."""
        block = Transformer2DModel(
            in_channels=32, heads=2, dim_head=16, cross_attention_dim=24
        )
        x = jax.random.normal(rng, (2, 8, 8, 32))
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 77, 24))
        params = block.init(rng, x, ctx)["params"]
        tb = _load(
            TorchTransformer2DModel(32, heads=2, dim_head=16, context_dim=24), params
        )
        ours = block.apply({"params": params}, x, ctx)
        theirs = tb(_nchw(x), torch.tensor(np.asarray(ctx)))
        _assert_close(ours, theirs, atol=1e-5)

    def test_transformer2d_linear_projection(self, rng):
        """SD2.1/SDXL-style spatial transformer (linear in/out, depth 2)."""
        block = Transformer2DModel(
            in_channels=32,
            heads=4,
            dim_head=8,
            depth=2,
            cross_attention_dim=24,
            use_linear_projection=True,
        )
        x = jax.random.normal(rng, (2, 8, 8, 32))
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 77, 24))
        params = block.init(rng, x, ctx)["params"]
        tb = _load(
            TorchTransformer2DModel(
                32, heads=4, dim_head=8, context_dim=24, depth=2,
                use_linear_projection=True,
            ),
            params,
        )
        ours = block.apply({"params": params}, x, ctx)
        theirs = tb(_nchw(x), torch.tensor(np.asarray(ctx)))
        _assert_close(ours, theirs, atol=1e-5)

    def test_upsample(self, rng):
        block = Upsample2D(32)
        x = jax.random.normal(rng, (2, 8, 8, 32))
        params = block.init(rng, x)["params"]
        ours = block.apply({"params": params}, x)
        theirs = _load(TorchUpsample2D(32), params)(_nchw(x))
        _assert_close(ours, theirs, atol=1e-5)

    def test_vae_mid_block(self, rng):
        """VAE mid block: resnet + single-head attention + resnet vs torch."""
        block = VaeMidBlock(64)
        x = jax.random.normal(rng, (2, 8, 8, 64))
        params = block.init(rng, x)["params"]

        class TorchVaeMid(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList(
                    [TorchResnetBlock2D(64, 64), TorchResnetBlock2D(64, 64)]
                )
                self.attentions = tnn.ModuleList([TorchVaeAttentionBlock(64)])

            def forward(self, x):
                x = self.resnets[0](x)
                x = self.attentions[0](x)
                return self.resnets[1](x)

        theirs = _load(TorchVaeMid(), params)(_nchw(x))
        ours = block.apply({"params": params}, x)
        _assert_close(ours, theirs, atol=1e-5)


class TorchTinyEncoder(tnn.Module):
    """diffusers Encoder for the TINY_VAE config (incl. asymmetric
    downsample padding), plus the quant_conv."""

    def __init__(self):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, 32, 3, padding=1)

        class Down(tnn.Module):
            def __init__(self, in_ch, out_ch, downsample):
                super().__init__()
                self.resnets = tnn.ModuleList([TorchResnetBlock2D(in_ch, out_ch)])
                if downsample:
                    self.downsamplers = tnn.ModuleList(
                        [TorchDownsample2D(out_ch, asymmetric_padding=True)]
                    )

            def forward(self, x):
                x = self.resnets[0](x)
                if hasattr(self, "downsamplers"):
                    x = self.downsamplers[0](x)
                return x

        self.down_blocks = tnn.ModuleList([Down(32, 32, True), Down(32, 64, False)])

        class Mid(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList(
                    [TorchResnetBlock2D(64, 64), TorchResnetBlock2D(64, 64)]
                )
                self.attentions = tnn.ModuleList([TorchVaeAttentionBlock(64)])

            def forward(self, x):
                x = self.resnets[0](x)
                x = self.attentions[0](x)
                return self.resnets[1](x)

        self.mid_block = Mid()
        self.conv_norm_out = tnn.GroupNorm(32, 64, eps=1e-6)
        self.conv_out = tnn.Conv2d(64, 8, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchTinyUNet(tnn.Module):
    """diffusers UNet2DConditionModel for the TINY_UNET config:
    (CrossAttnDown, Down) x (Up, CrossAttnUp), 1 layer/block, heads=2."""

    def __init__(self):
        super().__init__()
        self.conv_in = tnn.Conv2d(4, 32, 3, padding=1)

        class TimeEmbedding(tnn.Module):
            def __init__(self):
                super().__init__()
                self.linear_1 = tnn.Linear(32, 128)
                self.linear_2 = tnn.Linear(128, 128)

            def forward(self, t):
                return self.linear_2(F.silu(self.linear_1(t)))

        self.time_embedding = TimeEmbedding()

        class CrossDown(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList(
                    [TorchResnetBlock2D(32, 32, temb_ch=128)]
                )
                self.attentions = tnn.ModuleList(
                    [TorchTransformer2DModel(32, 2, 16, context_dim=32)]
                )
                self.downsamplers = tnn.ModuleList([TorchDownsample2D(32)])

            def forward(self, x, temb, ctx):
                skips = ()
                x = self.resnets[0](x, temb)
                x = self.attentions[0](x, ctx)
                skips += (x,)
                x = self.downsamplers[0](x)
                skips += (x,)
                return x, skips

        class PlainDown(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList(
                    [TorchResnetBlock2D(32, 64, temb_ch=128)]
                )

            def forward(self, x, temb):
                x = self.resnets[0](x, temb)
                return x, (x,)

        self.down_blocks = tnn.ModuleList([CrossDown(), PlainDown()])

        class Mid(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList(
                    [
                        TorchResnetBlock2D(64, 64, temb_ch=128),
                        TorchResnetBlock2D(64, 64, temb_ch=128),
                    ]
                )
                self.attentions = tnn.ModuleList(
                    [TorchTransformer2DModel(64, 2, 32, context_dim=32)]
                )

            def forward(self, x, temb, ctx):
                x = self.resnets[0](x, temb)
                x = self.attentions[0](x, ctx)
                return self.resnets[1](x, temb)

        self.mid_block = Mid()

        class PlainUp(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList(
                    [
                        TorchResnetBlock2D(64 + 64, 64, temb_ch=128),
                        TorchResnetBlock2D(64 + 32, 64, temb_ch=128),
                    ]
                )
                self.upsamplers = tnn.ModuleList([TorchUpsample2D(64)])

            def forward(self, x, skips, temb):
                for resnet in self.resnets:
                    x = torch.cat([x, skips[-1]], dim=1)
                    skips = skips[:-1]
                    x = resnet(x, temb)
                return self.upsamplers[0](x), skips

        class CrossUp(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList(
                    [
                        TorchResnetBlock2D(64 + 32, 32, temb_ch=128),
                        TorchResnetBlock2D(32 + 32, 32, temb_ch=128),
                    ]
                )
                self.attentions = tnn.ModuleList(
                    [
                        TorchTransformer2DModel(32, 2, 16, context_dim=32),
                        TorchTransformer2DModel(32, 2, 16, context_dim=32),
                    ]
                )

            def forward(self, x, skips, temb, ctx):
                for resnet, attn in zip(self.resnets, self.attentions):
                    x = torch.cat([x, skips[-1]], dim=1)
                    skips = skips[:-1]
                    x = resnet(x, temb)
                    x = attn(x, ctx)
                return x, skips

        self.up_blocks = tnn.ModuleList([PlainUp(), CrossUp()])
        self.conv_norm_out = tnn.GroupNorm(32, 32, eps=1e-5)
        self.conv_out = tnn.Conv2d(32, 4, 3, padding=1)

    @staticmethod
    def _time_proj(timesteps, dim=32):
        # diffusers Timesteps: flip_sin_to_cos=True, downscale_freq_shift=0
        half = dim // 2
        exponent = -torch.log(torch.tensor(10000.0)) * torch.arange(
            half, dtype=torch.float32
        )
        emb = torch.exp(exponent / half)
        emb = timesteps.float()[:, None] * emb[None, :]
        return torch.cat([emb.cos(), emb.sin()], dim=-1)

    def forward(self, sample, timesteps, ctx):
        temb = self.time_embedding(self._time_proj(timesteps))
        x = self.conv_in(sample)
        skips = (x,)
        x, s = self.down_blocks[0](x, temb, ctx)
        skips += s
        x, s = self.down_blocks[1](x, temb)
        skips += s
        x = self.mid_block(x, temb, ctx)
        x, skips = self.up_blocks[0](x, skips, temb)
        x, skips = self.up_blocks[1](x, skips, temb, ctx)
        assert not skips
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TestFullModelParity:
    def test_tiny_unet_forward(self, rng):
        """Full tiny-UNet forward (all block types + skips + time embedding)
        matches the hand-assembled torch equivalent on converted weights."""
        unet = UNet2DConditionModel(**configs.TINY_UNET)
        params = unet.init(rng, batch_size=2, height=16, width=16)
        sample = jax.random.normal(rng, (2, 4, 16, 16))
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 77, 32))
        t = jnp.array([3, 977])

        tm = TorchTinyUNet()
        sd = {
            k: torch.tensor(np.asarray(v))
            for k, v in flax_params_to_torch_state_dict(params).items()
        }
        tm.load_state_dict(sd, strict=True)
        tm.eval()

        ours = unet.apply(params, sample, t, ctx)  # NCHW in/out
        with torch.no_grad():
            theirs = tm(
                torch.tensor(np.asarray(sample)),
                torch.tensor(np.asarray(t)),
                torch.tensor(np.asarray(ctx)),
            )
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=3e-5, rtol=1e-4
        )

    def test_tiny_vae_encode(self, rng):
        """Full tiny-VAE encode (encoder + quant_conv moments) matches the
        hand-assembled torch equivalent, incl. asymmetric downsample pad."""
        vae = AutoencoderKL(**configs.TINY_VAE)
        params = vae.init(rng, batch_size=2, resolution=16)
        x = jax.random.normal(rng, (2, 3, 16, 16))

        enc = TorchTinyEncoder()
        quant = tnn.Conv2d(8, 8, 1)
        sd = flax_params_to_torch_state_dict(params)
        enc_sd = {
            k[len("encoder."):]: torch.tensor(np.asarray(v))
            for k, v in sd.items()
            if k.startswith("encoder.")
        }
        enc.load_state_dict(enc_sd, strict=True)
        quant.load_state_dict(
            {
                "weight": torch.tensor(np.asarray(sd["quant_conv.weight"])),
                "bias": torch.tensor(np.asarray(sd["quant_conv.bias"])),
            }
        )
        enc.eval()

        dist = vae.encode(x, params).latent_dist
        ours = jnp.concatenate([dist.mean, dist.logvar], axis=1)
        with torch.no_grad():
            theirs = quant(enc(torch.tensor(np.asarray(x))))
        # logvar is clipped in DiagonalGaussianDistribution; random-init
        # values stay inside (-30, 20) so the comparison is exact
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=3e-5, rtol=1e-4
        )


class TorchTinyDecoder(tnn.Module):
    """diffusers Decoder for the TINY_VAE config: conv_in -> mid -> up
    blocks over reversed channels (layers_per_block+1 resnets, nearest-2x
    upsample between) -> norm/silu/conv_out."""

    def __init__(self):
        super().__init__()
        self.conv_in = tnn.Conv2d(4, 64, 3, padding=1)

        class Mid(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList(
                    [TorchResnetBlock2D(64, 64), TorchResnetBlock2D(64, 64)]
                )
                self.attentions = tnn.ModuleList([TorchVaeAttentionBlock(64)])

            def forward(self, x):
                x = self.resnets[0](x)
                x = self.attentions[0](x)
                return self.resnets[1](x)

        self.mid_block = Mid()

        class Up(tnn.Module):
            def __init__(self, in_ch, out_ch, upsample):
                super().__init__()
                self.resnets = tnn.ModuleList(
                    [
                        TorchResnetBlock2D(in_ch, out_ch),
                        TorchResnetBlock2D(out_ch, out_ch),
                    ]
                )
                if upsample:
                    self.upsamplers = tnn.ModuleList([TorchUpsample2D(out_ch)])

            def forward(self, x):
                for r in self.resnets:
                    x = r(x)
                if hasattr(self, "upsamplers"):
                    x = self.upsamplers[0](x)
                return x

        self.up_blocks = tnn.ModuleList([Up(64, 64, True), Up(64, 32, False)])
        self.conv_norm_out = tnn.GroupNorm(32, 32, eps=1e-6)
        self.conv_out = tnn.Conv2d(32, 3, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for block in self.up_blocks:
            x = block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TestFullVaeDecodeParity:
    def test_tiny_vae_decode(self, rng):
        """Full tiny-VAE decode (post_quant_conv + decoder incl. nearest-2x
        upsampling) matches the hand-assembled torch equivalent."""
        vae = AutoencoderKL(**configs.TINY_VAE)
        params = vae.init(rng, batch_size=2, resolution=16)
        z = jax.random.normal(rng, (2, 4, 4, 4))

        dec = TorchTinyDecoder()
        post = tnn.Conv2d(4, 4, 1)
        sd = flax_params_to_torch_state_dict(params)
        dec_sd = {
            k[len("decoder."):]: torch.tensor(np.asarray(v))
            for k, v in sd.items()
            if k.startswith("decoder.")
        }
        dec.load_state_dict(dec_sd, strict=True)
        post.load_state_dict(
            {
                "weight": torch.tensor(np.asarray(sd["post_quant_conv.weight"])),
                "bias": torch.tensor(np.asarray(sd["post_quant_conv.bias"])),
            }
        )
        dec.eval()

        ours = vae.decode(z, params).sample
        with torch.no_grad():
            theirs = dec(post(torch.tensor(np.asarray(z))))
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=3e-5, rtol=1e-4
        )


class TestSDXLAddEmbedding:
    def test_text_time_add_embedding_matches_torch(self, rng):
        """SDXL 'text_time' micro-conditioning path (unet.py:119-138):
        sinusoidal(time_ids) -> concat with pooled text_embeds ->
        add_embedding MLP — golden against hand-assembled torch Linears on
        weights mapped through flax_params_to_torch_state_dict (the
        add_embedding linear_1 export key regression lived exactly here)."""
        from stable_diffusion_training_tpu.models.blocks import (
            TimestepEmbedding,
            get_sinusoidal_embeddings,
        )

        unet = UNet2DConditionModel(**configs.TINY_SDXL_UNET)
        params = unet.init(rng, batch_size=2, height=8, width=8)
        sd = {
            k: torch.tensor(np.asarray(v))
            for k, v in flax_params_to_torch_state_dict(params).items()
        }
        assert "add_embedding.linear_1.weight" in sd

        bsz = 2
        text_embeds = jax.random.normal(jax.random.fold_in(rng, 2), (bsz, 16))
        time_ids = jnp.asarray(
            [[1024, 1024, 0, 0, 1024, 1024], [768, 768, 32, 16, 512, 512]],
            jnp.float32,
        )

        # ours: the same modules the UNet forward composes
        time_embeds = get_sinusoidal_embeddings(
            time_ids.reshape(-1), 8, flip_sin_to_cos=True, freq_shift=0.0
        ).reshape(bsz, -1)
        add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1)
        inner = params["params"] if "params" in params else params
        ours = TimestepEmbedding(128).apply(
            {"params": inner["add_embedding"]}, add_embeds
        )

        # theirs: torch Linears on the exported weights + diffusers'
        # Timesteps math (flip_sin_to_cos=True, shift 0)
        lin1 = tnn.Linear(64, 128)
        lin2 = tnn.Linear(128, 128)
        lin1.load_state_dict(
            {"weight": sd["add_embedding.linear_1.weight"],
             "bias": sd["add_embedding.linear_1.bias"]}
        )
        lin2.load_state_dict(
            {"weight": sd["add_embedding.linear_2.weight"],
             "bias": sd["add_embedding.linear_2.bias"]}
        )
        with torch.no_grad():
            t_sin = TorchTinyUNet._time_proj(
                torch.tensor(np.asarray(time_ids.reshape(-1))), dim=8
            ).reshape(bsz, -1)
            cat = torch.cat(
                [torch.tensor(np.asarray(text_embeds)), t_sin], dim=-1
            )
            theirs = lin2(F.silu(lin1(cat)))

        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=2e-5, rtol=1e-4
        )
