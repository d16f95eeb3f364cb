"""Model zoo tests: shapes, finiteness, gradient checkpointing equivalence,
config round-trips, and CLIP numerics parity vs PyTorch transformers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_training_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DConditionModel,
    configs,
)


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def tiny_unet(rng):
    unet = UNet2DConditionModel(**configs.TINY_UNET)
    params = unet.init(rng, batch_size=2, height=8, width=8)
    return unet, params


class TestUNet:
    def test_forward_shape_nchw(self, tiny_unet):
        unet, params = tiny_unet
        sample = jnp.ones((2, 4, 8, 8))
        ctx = jnp.ones((2, 77, 32))
        out = unet.apply(params, sample, jnp.array([1, 2]), ctx)
        assert out.shape == (2, 4, 8, 8)
        assert bool(jnp.isfinite(out).all())

    def test_nhwc_matches_nchw(self, tiny_unet, rng):
        _, params = tiny_unet
        unet_nhwc = UNet2DConditionModel(**configs.TINY_UNET, data_format="NHWC")
        unet_nchw = UNet2DConditionModel(**configs.TINY_UNET)
        sample = jax.random.normal(rng, (2, 4, 8, 8))
        ctx = jax.random.normal(rng, (2, 77, 32))
        t = jnp.array([3, 7])
        out_nchw = unet_nchw.apply(params, sample, t, ctx)
        out_nhwc = unet_nhwc.apply(
            params, jnp.transpose(sample, (0, 2, 3, 1)), t, ctx
        )
        np.testing.assert_allclose(
            out_nchw, jnp.transpose(out_nhwc, (0, 3, 1, 2)), atol=1e-5
        )

    def test_gradient_checkpointing_same_output(self, tiny_unet, rng):
        _, params = tiny_unet
        unet_gc = UNet2DConditionModel(
            **configs.TINY_UNET, gradient_checkpointing=True
        )
        unet = UNet2DConditionModel(**configs.TINY_UNET)
        sample = jax.random.normal(rng, (2, 4, 8, 8))
        ctx = jax.random.normal(rng, (2, 77, 32))
        t = jnp.array([1, 2])
        np.testing.assert_allclose(
            unet.apply(params, sample, t, ctx),
            unet_gc.apply(params, sample, t, ctx),
            atol=1e-5,
        )

    @pytest.mark.slow  # full bwd x2 compile
    def test_gradient_checkpointing_same_grads(self, tiny_unet, rng):
        _, params = tiny_unet
        sample = jax.random.normal(rng, (1, 4, 8, 8))
        ctx = jax.random.normal(rng, (1, 77, 32))
        t = jnp.array([5])

        def loss_fn(p, gc):
            unet = UNet2DConditionModel(
                **configs.TINY_UNET, gradient_checkpointing=gc
            )
            return (unet.apply(p, sample, t, ctx) ** 2).mean()

        g_plain = jax.grad(lambda p: loss_fn(p, False))(params)
        g_remat = jax.grad(lambda p: loss_fn(p, True))(params)
        for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_rectangular_input(self, tiny_unet):
        unet, params = tiny_unet
        sample = jnp.ones((1, 4, 8, 16))
        ctx = jnp.ones((1, 77, 32))
        out = unet.apply(params, sample, jnp.array([0]), ctx)
        assert out.shape == (1, 4, 8, 16)

    def test_config_roundtrip(self, tmp_path):
        unet = UNet2DConditionModel(**configs.TINY_UNET)
        unet.save_config(str(tmp_path))
        cfg = UNet2DConditionModel.load_config(str(tmp_path))
        unet2 = UNet2DConditionModel.from_config(cfg)
        assert unet2.config.block_out_channels == list(
            configs.TINY_UNET["block_out_channels"]
        ) or tuple(unet2.config.block_out_channels) == tuple(
            configs.TINY_UNET["block_out_channels"]
        )
        assert unet2.config.cross_attention_dim == 32

    def test_sdxl_added_cond(self, rng):
        cfg = dict(configs.TINY_UNET)
        cfg.update(
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            addition_embed_type="text_time",
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=8 * 6 + 16,
        )
        unet = UNet2DConditionModel(**cfg)
        params = unet.init(rng, batch_size=1, height=8, width=8)
        added = {
            "text_embeds": jnp.ones((1, 16)),
            "time_ids": jnp.ones((1, 6)),
        }
        out = unet.apply(
            params,
            jnp.ones((1, 4, 8, 8)),
            jnp.array([1]),
            jnp.ones((1, 77, 32)),
            added_cond_kwargs=added,
        )
        assert out.shape == (1, 4, 8, 8)


class TestVAE:
    @pytest.fixture(scope="class")
    def vae(self, rng):
        vae = AutoencoderKL(**configs.TINY_VAE)
        return vae, vae.init(rng)

    def test_encode_decode_shapes(self, vae, rng):
        model, params = vae
        img = jax.random.uniform(rng, (2, 3, 32, 32), minval=-1, maxval=1)
        enc = model.encode(img, params)
        latents = enc.latent_dist.sample(rng)
        assert latents.shape == (2, 4, 16, 16)  # 2 blocks -> /2
        dec = model.decode(latents, params)
        assert dec.sample.shape == (2, 3, 32, 32)

    def test_latent_dist_stats(self, vae, rng):
        model, params = vae
        img = jnp.zeros((1, 3, 32, 32))
        dist = model.encode(img, params).latent_dist
        assert bool(jnp.isfinite(dist.mean).all())
        assert bool((dist.std > 0).all())
        assert dist.mode().shape == dist.mean.shape
        assert bool(jnp.isfinite(dist.kl()).all())

    def test_reference_call_shape(self, vae, rng):
        """The exact FrozenModel call used by the train step
        (reference training_utils.py:574-579)."""
        model, params = vae
        out = model.apply(
            {"params": params},
            jnp.zeros((1, 3, 32, 32)),
            deterministic=True,
            method="encode",
        )
        assert out.latent_dist.mean.shape == (1, 4, 16, 16)


class TestCLIP:
    def test_forward(self, rng):
        te = CLIPTextModel(**configs.TINY_CLIP)
        params = te.init(rng)
        ids = jax.random.randint(rng, (2, 77), 0, 1000)
        out = te(ids, params=params)
        assert out[0].shape == (2, 77, 32)
        assert bool(jnp.isfinite(out[0]).all())

    def test_causality(self, rng):
        """Changing a later token must not affect earlier positions."""
        te = CLIPTextModel(**configs.TINY_CLIP)
        params = te.init(rng)
        ids = jax.random.randint(rng, (1, 77), 0, 1000)
        ids2 = ids.at[0, 50].set((ids[0, 50] + 1) % 1000)
        h1 = te(ids, params=params)[0]
        h2 = te(ids2, params=params)[0]
        np.testing.assert_allclose(h1[0, :50], h2[0, :50], atol=1e-5)
        assert not np.allclose(h1[0, 50:], h2[0, 50:], atol=1e-5)

    @pytest.mark.slow

    def test_parity_vs_torch_transformers(self, rng):
        """Golden parity: our CLIP tower == transformers' PyTorch
        CLIPTextModel on converted weights (fp32, random init)."""
        torch = pytest.importorskip("torch")
        from transformers import CLIPTextConfig as HFConfig
        from transformers import CLIPTextModel as HFModel

        from stable_diffusion_training_tpu.models.hf_io import (
            torch_state_dict_to_flax,
        )

        hf_cfg = HFConfig(
            vocab_size=1000,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=77,
            hidden_act="quick_gelu",
        )
        torch.manual_seed(0)
        hf_model = HFModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
        sd = {
            k.replace("text_model.", "")
            .replace("embeddings.", "")
            .replace("encoder.layers", "layers"): v
            for k, v in sd.items()
        }
        params = torch_state_dict_to_flax(sd)

        te = CLIPTextModel(**configs.TINY_CLIP)
        ids_np = np.random.RandomState(0).randint(0, 1000, size=(2, 77))
        ours = te(jnp.asarray(ids_np), params=params)[0]
        with torch.no_grad():
            theirs = hf_model(torch.tensor(ids_np)).last_hidden_state.numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


class TestSD21Variants:
    """SD2.1 architecture knobs: per-block head dims, linear in/out
    projections in the spatial transformer, gelu CLIP."""

    @pytest.mark.slow  # SD2.1-variant block compile
    def test_per_block_heads_and_linear_projection(self, rng):
        cfg = dict(configs.TINY_UNET)
        cfg.update(attention_head_dim=(2, 4), use_linear_projection=True)
        unet = UNet2DConditionModel(**cfg)
        params = unet.init(rng, batch_size=1, height=8, width=8)
        out = unet.apply(
            params, jnp.ones((1, 4, 8, 8)), jnp.array([3]), jnp.ones((1, 77, 32))
        )
        assert out.shape == (1, 4, 8, 8)
        assert bool(jnp.isfinite(out).all())
        # linear projection -> proj_in is a Dense kernel (2D), not a 1x1 conv
        proj_in = params["down_blocks_0"]["attentions_0"]["proj_in"]["kernel"]
        assert proj_in.ndim == 2

    def test_gelu_clip_variant(self, rng):
        cfg = dict(configs.TINY_CLIP, hidden_act="gelu")
        te = CLIPTextModel(**cfg)
        params = te.init(rng)
        out = te(jnp.ones((1, 77), jnp.int32), params=params)[0]
        assert bool(jnp.isfinite(out).all())

    def test_sd21_full_config_constructs(self):
        """The real SD2.1 config builds a module (no init — too big for CI)."""
        unet = UNet2DConditionModel(**configs.SD21_UNET)
        assert unet.config.cross_attention_dim == 1024
        assert tuple(unet.config.attention_head_dim) == (5, 10, 20, 20)
        te = CLIPTextModel(**configs.OPEN_CLIP_VIT_H)
        assert te.text_config.num_hidden_layers == 23


class TestCLIPWithProjection:
    def test_forward_shapes(self, rng):
        from stable_diffusion_training_tpu.models import CLIPTextModelWithProjection

        te2 = CLIPTextModelWithProjection(**configs.TINY_CLIP, projection_dim=16,
                                          eos_token_id=2)
        params = te2.init(rng)
        # eos_token_id=2 takes the transformers legacy path: pool at the
        # highest-token-id position (the EOT token in CLIP vocabularies)
        ids = jnp.full((2, 77), 5, jnp.int32).at[:, 10].set(999)
        out = te2(ids, params=params)
        assert out.text_embeds.shape == (2, 16)
        assert out[1].shape == (2, 77, 32)  # last_hidden_state
        hs = te2(ids, params=params, output_hidden_states=True)
        assert len(hs.hidden_states) == configs.TINY_CLIP["num_hidden_layers"] + 1

    @pytest.mark.slow

    def test_parity_vs_torch_with_projection(self, rng):
        """Pooling position + projection match PyTorch transformers."""
        torch = pytest.importorskip("torch")
        from transformers import CLIPTextConfig as HFConfig
        from transformers import CLIPTextModelWithProjection as HFModel

        from stable_diffusion_training_tpu.models import CLIPTextModelWithProjection
        from stable_diffusion_training_tpu.models.hf_io import (
            torch_state_dict_to_flax,
        )

        hf_cfg = HFConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="gelu",
            projection_dim=16, eos_token_id=2,
        )
        torch.manual_seed(1)
        hf_model = HFModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
        sd = {
            k.replace("text_model.embeddings.", "text_model.")
            .replace("text_model.encoder.layers", "text_model.layers"): v
            for k, v in sd.items()
        }
        params = torch_state_dict_to_flax(sd)

        te2 = CLIPTextModelWithProjection(
            **dict(configs.TINY_CLIP, hidden_act="gelu"),
            projection_dim=16, eos_token_id=2,
        )
        ids_np = np.random.RandomState(1).randint(3, 1000, size=(2, 77))
        ids_np[:, 20] = 2  # EOS
        ours = te2(jnp.asarray(ids_np), params=params)
        with torch.no_grad():
            theirs = hf_model(torch.tensor(ids_np))
        np.testing.assert_allclose(
            np.asarray(ours.text_embeds), theirs.text_embeds.numpy(), atol=2e-5
        )


def test_ff_remat_identical_numerics_and_params():
    """ff_gradient_checkpointing (remat of the GEGLU FF) must not change
    param structure or numerics — it only trades saved residuals for two
    recompute matmuls in the backward."""
    import numpy as np

    from stable_diffusion_training_tpu.models.attention import (
        BasicTransformerBlock,
        set_remat_ff,
    )

    blk = BasicTransformerBlock(dim=32, heads=2, dim_head=16,
                                cross_attention_dim=32)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 32)),
                    jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 32)),
                      jnp.float32)
    try:
        set_remat_ff(False)
        p = blk.init(rng, x, ctx)
        o1 = blk.apply(p, x, ctx)
        g1 = jax.grad(lambda p: blk.apply(p, x, ctx).sum())(p)
        set_remat_ff(True)
        p2 = blk.init(rng, x, ctx)
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
        o2 = blk.apply(p2, x, ctx)
        g2 = jax.grad(lambda p: blk.apply(p, x, ctx).sum())(p2)
    finally:
        set_remat_ff(False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
