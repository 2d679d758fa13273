"""The DCVGAN model bundle and its single jitted train step.

The reference's training iteration (/root/reference/src/trainer.py:269-363)
is two eager phases — discriminators then generators — with five separate
``optimizer.step()`` calls, host round-trips for every loss scalar, and
implicit global RNG. Here the *entire* iteration is one pure function

    ``train_step(state, batch, key) -> (state, metrics)``

compiled once by XLA: both adversarial phases, all five Adam updates, all
RNG draws. The update-ratio gating (``num_gen_update`` / ``num_dis_update``)
is a ``lax.cond`` on the step counter, so no recompiles and no host control
flow. Observable reference semantics kept:

- fakes in the D phase don't propagate gradients to the generators (the
  reference discards those grads via zero_grad),
- the G phase sees the *updated* discriminators and draws *fresh* fakes
  (/root/reference/src/trainer.py:344-349),
- one shared random frame index t_rand for the image critic in both phases
  (/root/reference/src/trainer.py:279-280),
- gating parity: D updates when ``iteration % num_gen_update == 0``,
  G when ``iteration % num_dis_update == 0`` (the reference's inverted-name
  quirk, /root/reference/src/trainer.py:318,355) with 1-based iterations,
- optional ``ggen_double_step`` reproduces the reference's double
  ``opt_ggen.step()`` (/root/reference/src/trainer.py:357-359); off by
  default (single step is the evident intent).

Deltas (documented, deliberate): generator BatchNorm running stats update
once per iteration (G phase) instead of twice (the reference also updates
them during D-phase sampling); discriminator running stats update in the D
phase only (the reference also writes them during the G phase's critic
forwards). Running stats only affect eval-mode sampling, not training-mode
normalization.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dcvgan_tpu import prng
from dcvgan_tpu.config import ExperimentConfig, OptimizerConfig
from dcvgan_tpu.data.dataset import NUM_SEGM_PARTS
from dcvgan_tpu.losses import get_loss
from dcvgan_tpu.models import (
    ColorVideoGenerator,
    GeometricVideoGenerator,
    GradientDiscriminator,
    ImageDiscriminator,
    VideoDiscriminator,
)
from dcvgan_tpu.ops.dequant import dequantize_video
from dcvgan_tpu.train.state import GANState, ModelState

MODEL_NAMES = ("ggen", "cgen", "idis", "vdis", "gdis")


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """torch-parity Adam: coupled weight decay added to the gradient before
    the moment updates (reference: /root/reference/src/train.py:167-179)."""
    return optax.chain(
        optax.add_decayed_weights(cfg.decay),
        optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
        optax.scale(-cfg.lr),
    )


class DCVGAN:
    """Static model bundle: the five flax modules, losses, optimizers.

    All jax-traced state lives in :class:`GANState`; this object holds only
    hashable configuration, so its methods close over static structure and
    can be jitted directly.
    """

    def __init__(self, config: ExperimentConfig):
        self.config = config
        dtype = (
            jnp.bfloat16 if config.trainer.precision == "bfloat16" else jnp.float32
        )
        self.dtype = dtype
        gi = config.geometric_info

        norm = config.trainer.norm
        self.ggen = GeometricVideoGenerator(
            dim_z_content=config.ggen.dim_z_content,
            dim_z_motion=config.ggen.dim_z_motion,
            channel=gi.channel,
            geometric_info=gi.name,
            ngf=config.ggen.ngf,
            video_length=config.video_length,
            image_size=config.image_size,
            dtype=dtype,
            norm=norm,
        )
        self.cgen = ColorVideoGenerator(
            in_ch=gi.channel,
            dim_z=config.cgen.dim_z_color,
            geometric_info=gi.name,
            ngf=config.cgen.ngf,
            video_length=config.video_length,
            image_size=config.image_size,
            dtype=dtype,
            norm=norm,
        )
        self.idis = ImageDiscriminator(
            ch_g=gi.channel,
            ch_c=3,
            use_noise=config.idis.use_noise,
            noise_sigma=config.idis.noise_sigma,
            ndf=config.idis.ndf,
            dtype=dtype,
            norm=norm,
        )
        self.vdis = VideoDiscriminator(
            ch_g=gi.channel,
            ch_c=3,
            use_noise=config.vdis.use_noise,
            noise_sigma=config.vdis.noise_sigma,
            ndf=config.vdis.ndf,
            dtype=dtype,
            norm=norm,
        )
        self.gdis = GradientDiscriminator(
            ch_g=gi.channel,
            ch_c=3,
            use_noise=config.gdis.use_noise,
            noise_sigma=config.gdis.noise_sigma,
            ndf=config.gdis.ndf,
            dtype=dtype,
            norm=norm,
        )
        self.modules = {
            "ggen": self.ggen,
            "cgen": self.cgen,
            "idis": self.idis,
            "vdis": self.vdis,
            "gdis": self.gdis,
        }
        self.loss = get_loss(config.loss)
        self.tx = {
            name: make_optimizer(getattr(config, name).optimizer)
            for name in MODEL_NAMES
        }

        if config.mesh.time > 1:
            # time-sharded twins of the 3D critics: same parameter trees,
            # forward runs inside shard_map over (data, time) with halo
            # exchange + masked sync BN (SURVEY.md §5.7, VERDICT r1 #5)
            from dcvgan_tpu.parallel.mesh import DATA_AXIS, TIME_AXIS

            ts_kwargs = dict(time_axis=TIME_AXIS, bn_sync_axes=(DATA_AXIS,))
            self.vdis_ts = self.vdis.clone(**ts_kwargs)
            self.gdis_ts = self.gdis.clone(**ts_kwargs)

    # ----------------------------------------------------------------- init
    def init_state(self, key: jax.Array) -> GANState:
        """Initialize all five models' params/stats and optimizer states."""
        cfg = self.config
        t, s = cfg.video_length, cfg.image_size
        ch = cfg.geometric_info.channel
        kinit = prng.named(key, "params_init")
        keys = jax.random.split(kinit, 5)

        dummy_geo_v = jnp.zeros((1, t, s, s, ch), self.dtype)
        dummy_col_v = jnp.zeros((1, t, s, s, 3), self.dtype)
        dummy_geo_f = dummy_geo_v[:, 0]
        dummy_col_f = dummy_col_v[:, 0]

        variables = {
            "ggen": self.ggen.init(
                {"params": keys[0], "latent": keys[0]}, 1, train=False
            ),
            "cgen": self.cgen.init(
                {"params": keys[1], "latent": keys[1], "dropout": keys[1]},
                dummy_geo_v,
                train=False,
                method=ColorVideoGenerator.forward_videos,
            ),
            "idis": self.idis.init(
                {"params": keys[2], "noise": keys[2]}, dummy_geo_f, dummy_col_f
            ),
            "vdis": self.vdis.init(
                {"params": keys[3], "noise": keys[3]}, dummy_geo_v, dummy_col_v
            ),
            "gdis": self.gdis.init(
                {"params": keys[4], "noise": keys[4]}, dummy_geo_v, dummy_col_v
            ),
        }
        states = {}
        for name in MODEL_NAMES:
            params = variables[name]["params"]
            stats = variables[name].get("batch_stats", {})
            states[name] = ModelState(
                params=params,
                batch_stats=stats,
                opt_state=self.tx[name].init(params),
            )
        ema = None
        if cfg.trainer.ema_decay > 0:
            # EMA of the generator params, seeded at their init values
            ema = {
                "ggen": jax.tree.map(jnp.copy, states["ggen"].params),
                "cgen": jax.tree.map(jnp.copy, states["cgen"].params),
            }
        return GANState(step=jnp.zeros((), jnp.int32), ema=ema, **states)

    # ------------------------------------------------------------- sampling
    def sample_videos(
        self,
        state: GANState,
        key: jax.Array,
        batchsize: int,
    ) -> Tuple[jax.Array, jax.Array]:
        """Sample (geometry, color) videos ``(B, T, H, W, C)`` in [-1, 1].

        Always eval mode (running BN stats, no dropout) — the reference
        sets ``.eval()`` before sampling (/root/reference/src/util.py:296-297).
        Train-mode sampling exists only inside :meth:`train_step`, which
        threads the mutable batch statistics explicitly.
        """
        kg = prng.named(key, "ggen_motion")
        kc = prng.named(key, "cgen_color")
        xg = self.ggen.apply(
            {"params": state.ggen.params, "batch_stats": state.ggen.batch_stats},
            batchsize,
            train=False,
            rngs={"latent": kg},
        )
        xc = self.cgen.apply(
            {"params": state.cgen.params, "batch_stats": state.cgen.batch_stats},
            xg,
            train=False,
            rngs={"latent": kc},
            method=ColorVideoGenerator.forward_videos,
        )
        return xg, xc

    # --------------------------------------------------- time-sharded critics
    def _time_sharded_apply(self, module_ts, mesh):
        """Wrap a time-sharded critic in shard_map over (data, time): videos
        sharded on batch x time, params replicated, noise RNG folded per
        shard, BN stats psum'd inside (masked sync BN) so the returned
        batch_stats are replica-identical."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from dcvgan_tpu.parallel.mesh import DATA_AXIS, TIME_AXIS

        def apply(params, stats, xg, xc, nkey, train=True):
            def local(params, stats, xg, xc, nkey):
                shard_id = jax.lax.axis_index(DATA_AXIS) * jax.lax.axis_size(
                    TIME_AXIS
                ) + jax.lax.axis_index(TIME_AXIS)
                out, mut = module_ts.apply(
                    {"params": params, "batch_stats": stats},
                    xg,
                    xc,
                    train,
                    rngs={"noise": jax.random.fold_in(nkey, shard_id)},
                    mutable=["batch_stats"],
                )
                return out, mut.get("batch_stats", {})

            mapped = shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P(), P(), P(DATA_AXIS, TIME_AXIS), P(DATA_AXIS, TIME_AXIS), P(),
                ),
                out_specs=(P(DATA_AXIS), P()),
            )
            return mapped(params, stats, xg, xc, nkey)

        return apply

    def _critic_appliers(self, time_mesh):
        """name -> apply(params, stats, xg, xc, noise_key) -> (logits, stats).

        Plain module.apply by default; vdis/gdis switch to the shard_map
        time-sharded twins when a time mesh is active.
        """

        def plain(module):
            def apply(params, stats, xg, xc, nkey, train=True):
                out, mut = module.apply(
                    {"params": params, "batch_stats": stats},
                    xg,
                    xc,
                    train,
                    rngs={"noise": nkey},
                    mutable=["batch_stats"],
                )
                return out, mut.get("batch_stats", {})

            return apply

        appliers = {
            "idis": plain(self.idis),
            "vdis": plain(self.vdis),
            "gdis": plain(self.gdis),
        }
        if time_mesh is not None:
            appliers["vdis"] = self._time_sharded_apply(self.vdis_ts, time_mesh)
            appliers["gdis"] = self._time_sharded_apply(self.gdis_ts, time_mesh)
        return appliers

    # ------------------------------------------------------------ train step
    def train_step(
        self,
        state: GANState,
        batch: Dict[str, jax.Array],
        key: jax.Array,
        axis_name: "str | tuple | None" = None,
        time_mesh=None,
    ) -> Tuple[GANState, Dict[str, jax.Array]]:
        """One full GAN iteration (see module docstring). Jit me.

        ``axis_name=None`` (default): the step sees the *global* batch under
        jit — BatchNorm statistics are global-batch ("sync BN").
        ``axis_name="data"`` (or a tuple of batch-parallel axes, e.g.
        ``("dcn", "data")`` on a multi-slice mesh): the step runs per-replica
        inside shard_map — BN normalizes with **per-replica** statistics
        (torch-DDP-default semantics, the reference's single-GPU behavior
        extended); gradients, metrics, and stored running stats are pmean'd
        over the axes.
        """
        cfg = self.config
        geo = cfg.geometric_info.name
        step = state.step + 1  # 1-based, reference iteration semantics
        kstep = prng.for_step(key, step)
        if axis_name is not None:
            # diversify per-replica RNG draws (fakes, noise) while keeping
            # shared decisions (t_rand, gating) on the unfolded key
            klocal = jax.random.fold_in(kstep, jax.lax.axis_index(axis_name))
        else:
            klocal = kstep

        def pmean(x):
            return jax.lax.pmean(x, axis_name) if axis_name is not None else x

        def ingest(x: jax.Array) -> jax.Array:
            # uint8 batches arrive raw from the host (4x less transfer) and
            # dequantize on device through the Pallas kernel.
            if x.dtype == jnp.uint8:
                return dequantize_video(x, self.dtype)
            return x.astype(self.dtype)

        def ingest_geo(x: jax.Array) -> jax.Array:
            if geo == "segmentation" and x.dtype == jnp.uint8:
                # class labels arrive raw (25x less transfer than host-side
                # one-hot float32); expand on device
                return jax.nn.one_hot(x[..., 0], NUM_SEGM_PARTS, dtype=self.dtype)
            return ingest(x)

        xc_real = ingest(batch["color"])
        xg_real = ingest_geo(batch[geo])
        b = xc_real.shape[0]

        t_rand = jax.random.randint(
            prng.named(kstep, "t_rand"), (), 0, cfg.video_length
        )

        def frame(x: jax.Array) -> jax.Array:
            return jax.lax.dynamic_index_in_dim(x, t_rand, axis=1, keepdims=False)

        # ---------------------------------------------- generator forward defs
        kg = prng.named(klocal, "g_fake")

        def ggen_fwd(ggp):
            return self.ggen.apply(
                {"params": ggp, "batch_stats": state.ggen.batch_stats},
                b,
                train=True,
                rngs={"latent": prng.named(kg, "ggen_motion")},
                mutable=["batch_stats"],
            )

        def cgen_fwd(cgp, xg_f):
            return self.cgen.apply(
                {"params": cgp, "batch_stats": state.cgen.batch_stats},
                xg_f,
                train=True,
                rngs={
                    "latent": prng.named(kg, "cgen_color"),
                    "dropout": prng.named(kg, "cgen_dropout"),
                },
                mutable=["batch_stats"],
                method=ColorVideoGenerator.forward_videos,
            )

        if cfg.trainer.remat:
            # recompute generator activations in the backward pass instead
            # of keeping them resident (HBM-for-FLOPs trade)
            ggen_fwd = jax.checkpoint(ggen_fwd)
            cgen_fwd = jax.checkpoint(cgen_fwd)

        # ------------------------------------------------ phase discriminator
        shared = cfg.trainer.shared_fakes
        gen_vjp = fakes_g = shared_stats = None
        if shared:
            # one generator forward per step: linearize it now so the G
            # phase can pull gradients back through the same samples
            def gen_forward(g_params):
                ggp, cgp = g_params
                xg_f, gg_mut = ggen_fwd(ggp)
                xc_f, cg_mut = cgen_fwd(cgp, xg_f)
                return (xg_f, xc_f), (
                    gg_mut.get("batch_stats", {}), cg_mut.get("batch_stats", {})
                )

            fakes_g, gen_vjp, shared_stats = jax.vjp(
                gen_forward,
                (state.ggen.params, state.cgen.params),
                has_aux=True,
            )
            xg_fake = jax.lax.stop_gradient(fakes_g[0])
            xc_fake = jax.lax.stop_gradient(fakes_g[1])
        else:
            # reference semantics: fresh fakes for the D phase
            # (/root/reference/src/trainer.py:304-305)
            kd = prng.named(klocal, "d_fake")
            xg_fake = self.ggen.apply(
                {"params": state.ggen.params, "batch_stats": state.ggen.batch_stats},
                b,
                train=True,
                rngs={"latent": prng.named(kd, "ggen_motion")},
                mutable=["batch_stats"],
            )[0]
            xc_fake = self.cgen.apply(
                {"params": state.cgen.params, "batch_stats": state.cgen.batch_stats},
                xg_fake,
                train=True,
                rngs={
                    "latent": prng.named(kd, "cgen_color"),
                    "dropout": prng.named(kd, "cgen_dropout"),
                },
                mutable=["batch_stats"],
                method=ColorVideoGenerator.forward_videos,
            )[0]
            xg_fake = jax.lax.stop_gradient(xg_fake)
            xc_fake = jax.lax.stop_gradient(xc_fake)

        appliers = self._critic_appliers(time_mesh)

        def critic_apply(name, params, stats, xg, xc, nkey, is_frame):
            x1 = frame(xg) if is_frame else xg
            x2 = frame(xc) if is_frame else xc
            return appliers[name](params, stats, x1, x2, nkey)

        def d_loss_fn(d_params):
            ip, vp, gp = d_params
            losses = {}
            new_stats = {}
            specs = [
                ("idis", ip, state.idis.batch_stats, True),
                ("vdis", vp, state.vdis.batch_stats, False),
                ("gdis", gp, state.gdis.batch_stats, False),
            ]
            for name, params, stats, is_frame in specs:
                nkey = prng.named(klocal, f"{name}_noise")
                if cfg.trainer.critic_joint_batch:
                    # one 2B forward on [real; fake]: half the conv
                    # dispatches, joint-batch BN stats (documented delta)
                    xg_j = jnp.concatenate([xg_real, xg_fake], axis=0)
                    xc_j = jnp.concatenate([xc_real, xc_fake], axis=0)
                    y, stats = critic_apply(
                        name, params, stats, xg_j, xc_j,
                        prng.named(nkey, "joint"), is_frame,
                    )
                    y_real, y_fake = y[:b], y[b:]
                else:
                    y_real, stats = critic_apply(
                        name, params, stats, xg_real, xc_real,
                        prng.named(nkey, "d_fake"), is_frame,
                    )
                    y_fake, stats = critic_apply(
                        name, params, stats, xg_fake, xc_fake,
                        prng.named(nkey, "g_fake"), is_frame,
                    )
                losses[name] = self.loss.dis(y_real, y_fake)
                new_stats[name] = stats
            total = losses["idis"] + losses["vdis"] + losses["gdis"]
            return total, (losses, new_stats)

        d_params = (state.idis.params, state.vdis.params, state.gdis.params)
        d_grads, (d_losses, d_stats) = jax.grad(d_loss_fn, has_aux=True)(d_params)
        d_grads = pmean(d_grads)
        d_stats = pmean(d_stats)
        d_losses = pmean(d_losses)

        do_d = (step % cfg.num_gen_update) == 0

        def gated_update(
            mstate: ModelState, grads, tx, do: jax.Array, stats, n_steps: int = 1
        ) -> ModelState:
            def apply_fn(ms):
                params, opt_state = ms.params, ms.opt_state
                for _ in range(n_steps):
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                return ms.replace(
                    params=params, opt_state=opt_state, batch_stats=stats
                )

            def keep_fn(ms):
                # BN stats advance regardless of the optimizer gate (torch BN
                # updates running stats on every forward).
                return ms.replace(batch_stats=stats)

            return jax.lax.cond(do, apply_fn, keep_fn, mstate)

        new_idis = gated_update(state.idis, d_grads[0], self.tx["idis"], do_d, d_stats["idis"])
        new_vdis = gated_update(state.vdis, d_grads[1], self.tx["vdis"], do_d, d_stats["vdis"])
        new_gdis = gated_update(state.gdis, d_grads[2], self.tx["gdis"], do_d, d_stats["gdis"])

        # ---------------------------------------------------- phase generator
        def critic_g_loss(xg_f, xc_f):
            # critics: *updated* D params; train-mode batch stats (not
            # persisted), or frozen running stats under critic_stat_reuse
            # (skips the BN stat reductions in this fwd+bwd)
            g_train = not cfg.trainer.critic_stat_reuse
            y_i, _ = appliers["idis"](
                new_idis.params, new_idis.batch_stats,
                frame(xg_f), frame(xc_f), prng.named(kg, "idis_noise"),
                g_train,
            )
            y_v, _ = appliers["vdis"](
                new_vdis.params, new_vdis.batch_stats,
                xg_f, xc_f, prng.named(kg, "vdis_noise"), g_train,
            )
            y_g, _ = appliers["gdis"](
                new_gdis.params, new_gdis.batch_stats,
                xg_f, xc_f, prng.named(kg, "gdis_noise"), g_train,
            )
            return self.loss.gen(y_i, y_v, y_g)

        g_params = (state.ggen.params, state.cgen.params)
        if shared:
            # pull the critic gradient back through the shared forward
            loss_gen, dfakes = jax.value_and_grad(
                lambda fakes: critic_g_loss(*fakes)
            )(fakes_g)
            (g_grads,) = gen_vjp(dfakes)
            gg_stats, cg_stats = shared_stats
        else:

            def g_loss_fn(g_params):
                ggp, cgp = g_params
                xg_f, gg_mut = ggen_fwd(ggp)
                xc_f, cg_mut = cgen_fwd(cgp, xg_f)
                loss_gen = critic_g_loss(xg_f, xc_f)
                return loss_gen, (
                    gg_mut.get("batch_stats", {}), cg_mut.get("batch_stats", {})
                )

            g_grads, (loss_gen, (gg_stats, cg_stats)) = _grad_with_value(
                g_loss_fn, g_params
            )
        g_grads = pmean(g_grads)
        gg_stats, cg_stats = pmean(gg_stats), pmean(cg_stats)
        loss_gen = pmean(loss_gen)

        do_g = (step % cfg.num_dis_update) == 0
        ggen_steps = 2 if cfg.trainer.ggen_double_step else 1
        new_ggen = gated_update(
            state.ggen, g_grads[0], self.tx["ggen"], do_g, gg_stats, ggen_steps
        )
        new_cgen = gated_update(state.cgen, g_grads[1], self.tx["cgen"], do_g, cg_stats)

        new_ema = state.ema
        if state.ema is not None:
            # advance the generator EMA only when the generators stepped:
            # decay 1.0 on gated-off iterations leaves it untouched. Params
            # are replica-identical under the sharded step (grads pmean'd
            # above), so the EMA needs no collective of its own.
            d_eff = jnp.where(do_g, cfg.trainer.ema_decay, 1.0)
            new_ema = jax.tree.map(
                lambda e, p: e * d_eff + p.astype(e.dtype) * (1.0 - d_eff),
                state.ema,
                {"ggen": new_ggen.params, "cgen": new_cgen.params},
            )

        new_state = GANState(
            step=step,
            ggen=new_ggen,
            cgen=new_cgen,
            idis=new_idis,
            vdis=new_vdis,
            gdis=new_gdis,
            ema=new_ema,
        )
        metrics = {
            "loss_idis": d_losses["idis"],
            "loss_vdis": d_losses["vdis"],
            "loss_gdis": d_losses["gdis"],
            "loss_gen": loss_gen,
        }
        return new_state, metrics

    # ------------------------------------------------------------- jit entry
    @functools.cached_property
    def jitted_train_step(self):
        donate = (0,) if self.config.trainer.donate_state else ()
        return jax.jit(self.train_step, donate_argnums=donate)

    def sharded_train_step(self, mesh):
        """Per-replica-BN variant: the step runs inside shard_map over the
        mesh's batch-parallel axes (``sync_batchnorm: false``): ``data``,
        plus the outer ``dcn`` axis on multi-slice meshes. BatchNorm
        normalizes with local-shard statistics; gradients/metrics/stored
        running stats are pmean'd over all batch-parallel axes (the dcn
        reduction is the once-per-step DCN collective), so parameters remain
        replica-identical."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from dcvgan_tpu.parallel.mesh import data_axes

        axes = data_axes(mesh)

        def local(state, batch, key):
            return self.train_step(state, batch, key, axis_name=axes)

        mapped = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axes), P()),
            out_specs=(P(), P()),
        )
        donate = (0,) if self.config.trainer.donate_state else ()
        return jax.jit(mapped, donate_argnums=donate)

    def time_sharded_train_step(self, mesh):
        """Plain-jit step with the 3D critics time-sharded over the mesh
        ``time`` axis (``mesh.time > 1``): halo-exchange convs + masked sync
        BN inside shard_map, numerically matching the unsharded critics on
        the valid frames. Requires sync_batchnorm (global-batch BN) — the
        per-replica shard_map path would need nested shard_maps."""
        if not self.config.trainer.sync_batchnorm:
            raise ValueError(
                "mesh.time > 1 requires trainer.sync_batchnorm=true"
            )
        from dcvgan_tpu.parallel.mesh import DCN_AXIS

        if DCN_AXIS in mesh.axis_names:
            raise NotImplementedError(
                "mesh.time > 1 with mesh.dcn > 1 is not supported: the "
                "time-sharded critics' inner shard_map would need the dcn "
                "axis threaded through its halo exchange"
            )
        donate = (0,) if self.config.trainer.donate_state else ()

        def step(state, batch, key):
            return self.train_step(state, batch, key, time_mesh=mesh)

        return jax.jit(step, donate_argnums=donate)


def _grad_with_value(loss_fn, params):
    (value, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return grads, (value, aux)
