"""Numerical parity between reference-style torch modules and our models
with imported weights.

These tests construct torch modules with the *reference's exact layer
topology and state-dict naming* (Sequential indices per
/root/reference/src/generator.py and discriminator.py), randomize their
weights and BN running stats, export ``state_dict()``, convert through
``dcvgan_tpu.compat``, and assert eval-mode outputs agree to float32
tolerance. This validates the transposed-conv output-sizing/adjoint parity
called out as a top risk in SURVEY.md ("Transposed-conv parity … must match
exactly for weight-port validation").
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from dcvgan_tpu.compat import (
    cgen_from_torch,
    gdis_from_torch,
    ggen_from_torch,
    idis_from_torch,
    vdis_from_torch,
)
from dcvgan_tpu.models import (
    ColorVideoGenerator,
    GeometricVideoGenerator,
    GradientDiscriminator,
    ImageDiscriminator,
    VideoDiscriminator,
)

torch.manual_seed(0)
NGF = 8
ATOL = 2e-4


def randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)


def to_jax_nhwc(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def to_jax_nthwc(x: torch.Tensor) -> jnp.ndarray:
    # torch video (B, C, T, H, W) -> ours (B, T, H, W, C)
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))


# --------------------------------------------------------------------- ggen
def make_torch_ggen_decoder(dim_z, channel, ngf):
    return tnn.Sequential(
        tnn.ConvTranspose2d(dim_z, ngf * 8, 4, 1, 0, bias=False),
        tnn.BatchNorm2d(ngf * 8),
        tnn.ReLU(),
        tnn.ConvTranspose2d(ngf * 8, ngf * 4, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(ngf * 4),
        tnn.ReLU(),
        tnn.ConvTranspose2d(ngf * 4, ngf * 2, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(ngf * 2),
        tnn.ReLU(),
        tnn.ConvTranspose2d(ngf * 2, ngf, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(ngf),
        tnn.ReLU(),
        tnn.ConvTranspose2d(ngf, channel, 4, 2, 1, bias=False),
        tnn.Tanh(),
    )


class TorchGGen(tnn.Module):
    """Reference GeometricVideoGenerator state-dict shape (decoder + GRU)."""

    def __init__(self, dim_zc, dim_zm, channel, ngf):
        super().__init__()
        self.recurrent = tnn.GRUCell(dim_zm, dim_zm)
        self.main = make_torch_ggen_decoder(dim_zc + dim_zm, channel, ngf)


def test_ggen_decoder_parity():
    dim_zc, dim_zm, channel = 6, 4, 1
    tmodel = TorchGGen(dim_zc, dim_zm, channel, NGF)
    randomize_bn(tmodel)
    tmodel.eval()
    sd = tmodel.state_dict()

    model = GeometricVideoGenerator(
        dim_z_content=dim_zc, dim_z_motion=dim_zm, channel=channel,
        ngf=NGF, video_length=4,
    )
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, 1,
        train=False,
    )
    params, stats = ggen_from_torch(sd)
    params["recurrent"] = {"cell": params["recurrent"]["cell"]}
    variables = {"params": params, "batch_stats": stats}

    z = np.random.default_rng(0).normal(size=(3, dim_zc + dim_zm)).astype(np.float32)
    with torch.no_grad():
        want = tmodel.main(torch.from_numpy(z).view(3, -1, 1, 1)).numpy()
    got = model.apply(
        variables, jnp.asarray(z), False, method=GeometricVideoGenerator.decode
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_gru_parity():
    dim_zm, B, T = 4, 3, 6
    tmodel = TorchGGen(5, dim_zm, 1, NGF)
    sd = tmodel.state_dict()
    params, _ = ggen_from_torch(sd)

    rng = np.random.default_rng(1)
    e = rng.normal(size=(B, T, dim_zm)).astype(np.float32)
    h0 = rng.normal(size=(B, dim_zm)).astype(np.float32)

    with torch.no_grad():
        h = torch.from_numpy(h0)
        outs = []
        for t in range(T):
            h = tmodel.recurrent(torch.from_numpy(e[:, t]), h)
            outs.append(h.numpy().copy())
        want = np.stack(outs, axis=1)

    import flax.linen as nn

    cell = nn.GRUCell(features=dim_zm)
    rnn = nn.RNN(cell)
    got = rnn.apply(
        {"params": {"cell": params["recurrent"]["cell"]}},
        jnp.asarray(e),
        initial_carry=jnp.asarray(h0),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


# --------------------------------------------------------------------- cgen
class TorchCGen(tnn.Module):
    """Reference ColorVideoGenerator topology + state-dict naming
    (/root/reference/src/generator.py:285-345)."""

    def __init__(self, in_ch, dim_z, ngf):
        super().__init__()

        def seq(*layers):
            return tnn.Sequential(*layers)

        def down(i, o):
            return tnn.Sequential(
                tnn.Conv2d(i, o, 4, 2, 1, bias=False),
                tnn.BatchNorm2d(o),
                tnn.LeakyReLU(0.2),
            )

        def up(i, o, dropout=False):
            layers = [
                tnn.ConvTranspose2d(i, o, 4, 2, 1, bias=False),
                tnn.BatchNorm2d(o),
                tnn.ReLU(),
            ]
            if dropout:
                layers.insert(2, tnn.Dropout2d(0.5))
            return tnn.Sequential(*layers)

        class Wrap(tnn.Module):
            def __init__(self, main):
                super().__init__()
                self.main = main

        self.inconv = Wrap(seq(tnn.Conv2d(in_ch, ngf, 3, 1, 1, bias=False), tnn.LeakyReLU()))
        self.down_blocks = tnn.ModuleList(
            [Wrap(down(ngf, ngf)), Wrap(down(ngf, ngf * 2)),
             Wrap(down(ngf * 2, ngf * 4)), Wrap(down(ngf * 4, ngf * 4)),
             Wrap(down(ngf * 4, ngf * 4)), Wrap(down(ngf * 4, ngf * 4))]
        )
        self.up_blocks = tnn.ModuleList(
            [Wrap(up(ngf * 4 + dim_z, ngf * 4, True)), Wrap(up(ngf * 8, ngf * 4, True)),
             Wrap(up(ngf * 8, ngf * 4)), Wrap(up(ngf * 8, ngf * 2)),
             Wrap(up(ngf * 4, ngf)), Wrap(up(ngf * 2, ngf))]
        )
        self.outconv = Wrap(
            seq(tnn.ConvTranspose2d(ngf * 2, 3, 3, 1, 1, bias=False), tnn.Tanh())
        )

    def forward(self, x, z):
        hs = [self.inconv.main(x)]
        for blk in self.down_blocks:
            hs.append(blk.main(hs[-1]))
        h = torch.cat([hs[-1], z], 1)
        h = self.up_blocks[0].main(h)
        for i in range(1, 6):
            h = torch.cat([h, hs[-i - 1]], 1)
            h = self.up_blocks[i].main(h)
        return self.outconv.main(torch.cat([h, hs[0]], 1))


def test_cgen_parity():
    in_ch, dim_z = 1, 4
    tmodel = TorchCGen(in_ch, dim_z, NGF)
    randomize_bn(tmodel)
    tmodel.eval()
    sd = tmodel.state_dict()

    model = ColorVideoGenerator(in_ch=in_ch, dim_z=dim_z, ngf=NGF)
    params, stats = cgen_from_torch(sd)
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (2, in_ch, 64, 64)).astype(np.float32)
    z = rng.normal(size=(2, dim_z)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(x), torch.from_numpy(z).view(2, -1, 1, 1)
        ).numpy()
    got = model.apply(
        variables, to_jax_nhwc(torch.from_numpy(x)), jnp.asarray(z), train=False
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=ATOL
    )


# ------------------------------------------------------------ discriminators
class TorchIDis(tnn.Module):
    def __init__(self, ch1, ch2, ndf):
        super().__init__()
        ident = tnn.Identity  # stands in for the (disabled) Noise layer
        self.conv_g = tnn.Sequential(
            ident(), tnn.Conv2d(ch1, ndf // 2, 4, 2, 1, bias=False), tnn.LeakyReLU(0.2)
        )
        self.conv_c = tnn.Sequential(
            ident(), tnn.Conv2d(ch2, ndf // 2, 4, 2, 1, bias=False), tnn.LeakyReLU(0.2)
        )
        self.main = tnn.Sequential(
            ident(),
            tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 2),
            tnn.LeakyReLU(0.2),
            ident(),
            tnn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 4),
            tnn.LeakyReLU(0.2),
            ident(),
            tnn.Conv2d(ndf * 4, 1, 4, 2, 1, bias=False),
        )

    def forward(self, xg, xc):
        h = torch.cat([self.conv_c(xc), self.conv_g(xg)], 1)
        return self.main(h).squeeze()


def test_idis_parity():
    tmodel = TorchIDis(1, 3, NGF)
    randomize_bn(tmodel)
    tmodel.eval()
    model = ImageDiscriminator(ch_g=1, ch_c=3, use_noise=False, ndf=NGF)
    params, stats = idis_from_torch(tmodel.state_dict())
    variables = {"params": params, "batch_stats": stats}
    rng = np.random.default_rng(3)
    xg = rng.uniform(-1, 1, (2, 1, 64, 64)).astype(np.float32)
    xc = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(xg), torch.from_numpy(xc)).numpy()
    got = model.apply(
        variables, to_jax_nhwc(torch.from_numpy(xg)), to_jax_nhwc(torch.from_numpy(xc)),
        mutable=["batch_stats"],
    )[0]
    # Our critic applies train-mode BN stats; for parity use eval stats via
    # a custom apply: batch stats fixed. ImageDiscriminator hardcodes
    # train-mode BN (matching the reference's always-train loop), so
    # compare against torch in train() mode instead.
    tmodel.train()
    with torch.no_grad():
        want_train = tmodel(torch.from_numpy(xg), torch.from_numpy(xc)).numpy()
    np.testing.assert_allclose(np.asarray(got), want_train, atol=ATOL)


class TorchVDis(tnn.Module):
    def __init__(self, ch1, ch2, ndf):
        super().__init__()
        ident = tnn.Identity
        self.conv_g = tnn.Sequential(
            tnn.Conv3d(ch1, ndf // 2, 4, (1, 2, 2), (0, 1, 1), bias=False),
            tnn.LeakyReLU(0.2),
        )
        self.conv_c = tnn.Sequential(
            tnn.Conv3d(ch2, ndf // 2, 4, (1, 2, 2), (0, 1, 1), bias=False),
            tnn.LeakyReLU(0.2),
        )
        self.main = tnn.Sequential(
            ident(),
            tnn.Conv3d(ndf, ndf * 2, 4, (1, 2, 2), (0, 1, 1), bias=False),
            tnn.BatchNorm3d(ndf * 2),
            tnn.LeakyReLU(0.2),
            ident(),
            tnn.Conv3d(ndf * 2, ndf * 4, 4, (1, 2, 2), (0, 1, 1), bias=False),
            tnn.BatchNorm3d(ndf * 4),
            tnn.LeakyReLU(0.2),
            ident(),
            tnn.Conv3d(ndf * 4, 1, 4, (1, 2, 2), (0, 1, 1), bias=False),
        )

    def forward(self, xg, xc):
        h = torch.cat([self.conv_c(xc), self.conv_g(xg)], 1)
        return self.main(h).squeeze()


def test_vdis_parity():
    tmodel = TorchVDis(1, 3, NGF)
    randomize_bn(tmodel)
    tmodel.train()
    model = VideoDiscriminator(ch_g=1, ch_c=3, use_noise=False, ndf=NGF)
    params, stats = vdis_from_torch(tmodel.state_dict())
    variables = {"params": params, "batch_stats": stats}
    rng = np.random.default_rng(4)
    xg = rng.uniform(-1, 1, (2, 1, 16, 64, 64)).astype(np.float32)
    xc = rng.uniform(-1, 1, (2, 3, 16, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(xg), torch.from_numpy(xc)).numpy()
    got = model.apply(
        variables,
        to_jax_nthwc(torch.from_numpy(xg)),
        to_jax_nthwc(torch.from_numpy(xc)),
        mutable=["batch_stats"],
    )[0]
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


class TorchGDis(tnn.Module):
    def __init__(self, ch1, ndf):
        super().__init__()
        ident = tnn.Identity
        self.main = tnn.Sequential(
            ident(),
            tnn.Conv3d(ch1, ndf, 4, (1, 2, 2), (0, 1, 1), bias=False),
            tnn.BatchNorm3d(ndf),
            tnn.LeakyReLU(0.2),
            ident(),
            tnn.Conv3d(ndf, ndf * 2, 4, (1, 2, 2), (0, 1, 1), bias=False),
            tnn.BatchNorm3d(ndf * 2),
            tnn.LeakyReLU(0.2),
            ident(),
            tnn.Conv3d(ndf * 2, ndf * 4, 4, (1, 2, 2), (0, 1, 1), bias=False),
            tnn.BatchNorm3d(ndf * 4),
            tnn.LeakyReLU(0.2),
            ident(),
            tnn.Conv3d(ndf * 4, 1, 4, (1, 2, 2), (0, 1, 1), bias=False),
        )

    def forward(self, xg):
        d = xg[:, :, 1:] - xg[:, :, :-1]
        return self.main(d).squeeze()


def test_gdis_parity():
    tmodel = TorchGDis(1, NGF)
    randomize_bn(tmodel)
    tmodel.train()
    model = GradientDiscriminator(ch_g=1, ch_c=3, use_noise=False, ndf=NGF)
    params, stats = gdis_from_torch(tmodel.state_dict())
    variables = {"params": params, "batch_stats": stats}
    rng = np.random.default_rng(5)
    xg = rng.uniform(-1, 1, (2, 1, 16, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(xg)).numpy()
    got = model.apply(
        variables, to_jax_nthwc(torch.from_numpy(xg)), None,
        mutable=["batch_stats"],
    )[0]
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


# ------------------------------------------------------- import CLI bridge
def test_import_torch_cli_roundtrip(tmp_path):
    """Reference-style .pth snapshots -> import CLI -> Orbax -> sampling."""
    import yaml

    torch_dir = tmp_path / "torch_models"
    torch_dir.mkdir()
    it = 5
    models = {
        "ggen": TorchGGen(6, 4, 1, NGF),
        "cgen": TorchCGen(1, 4, NGF),
        "idis": TorchIDis(1, 3, NGF),
        "vdis": TorchVDis(1, 3, NGF),
        "gdis": TorchGDis(1, NGF),
    }
    for name, m in models.items():
        randomize_bn(m)
        torch.save(m.state_dict(), torch_dir / f"{name}_params_{it:05d}.pth")

    cfg = {
        "experiment_name": "imported",
        "batchsize": 2,
        "video_length": 16,
        "image_size": 64,
        "geometric_info": {"name": "depth", "channel": 1},
        "ggen": {"dim_z_content": 6, "dim_z_motion": 4, "ngf": NGF},
        "cgen": {"dim_z_color": 4, "ngf": NGF},
        "idis": {"use_noise": False, "ndf": NGF},
        "vdis": {"use_noise": False, "ndf": NGF},
        "gdis": {"use_noise": False, "ndf": NGF},
        "trainer": {"precision": "float32"},
    }
    cfg_path = tmp_path / "cfg.yml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from dcvgan_tpu.cli.import_torch import main as import_main

    out = tmp_path / "run"
    import_main([str(torch_dir), str(it), "--config", str(cfg_path), "--out", str(out)])

    # restore and sample
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.train.checkpoint import CheckpointManager
    from dcvgan_tpu.train.step import DCVGAN

    cfg2 = load_config(out / "config.yml")
    gan = DCVGAN(cfg2)
    state = gan.init_state(prng.base_key(0))
    state = CheckpointManager(out / "models").restore(state)
    assert int(state.step) == it

    # imported ggen decoder weights match the torch source exactly
    w_torch = models["ggen"].main[0].weight.detach().numpy()
    w_ours = np.asarray(state.ggen.params["ups_0"]["kernel"])
    np.testing.assert_allclose(w_ours, w_torch.transpose(2, 3, 1, 0))

    xg, xc = gan.sample_videos(state, prng.base_key(1), 2)
    assert xg.shape == (2, 16, 64, 64, 1)
    assert xc.shape == (2, 16, 64, 64, 3)
    assert np.isfinite(np.asarray(xc)).all()


def test_import_structure_at_flagship_scale():
    """Weight-port tree structure matches at full mug-depth sizes (ngf=64)."""
    import jax

    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.train.step import DCVGAN

    cfg = load_config("configs/mug-depth.yml")
    gan = DCVGAN(cfg)
    state = gan.init_state(jax.random.key(0))

    models = {
        "ggen": TorchGGen(cfg.ggen.dim_z_content, cfg.ggen.dim_z_motion, 1, cfg.ggen.ngf),
        "cgen": TorchCGen(1, cfg.cgen.dim_z_color, cfg.cgen.ngf),
        "idis": TorchIDis(1, 3, cfg.idis.ndf),
        "vdis": TorchVDis(1, 3, cfg.vdis.ndf),
        "gdis": TorchGDis(1, cfg.gdis.ndf),
    }
    converters = {
        "ggen": ggen_from_torch, "cgen": cgen_from_torch,
        "idis": idis_from_torch, "vdis": vdis_from_torch,
        "gdis": gdis_from_torch,
    }
    for name, tmodel in models.items():
        params, stats = converters[name](tmodel.state_dict())
        ours = getattr(state, name)
        got_shapes = jax.tree.map(lambda x: tuple(x.shape), params)
        want_shapes = jax.tree.map(lambda x: tuple(x.shape), ours.params)
        assert got_shapes == want_shapes, name
        got_stats = jax.tree.map(lambda x: tuple(x.shape), stats)
        want_stats = jax.tree.map(lambda x: tuple(x.shape), ours.batch_stats)
        assert got_stats == want_stats, name
