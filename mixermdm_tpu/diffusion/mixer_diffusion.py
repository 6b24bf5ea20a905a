"""Dual-stream MixerMDM diffusion: DDIM scan + adversarial training losses.

Parity source ``/root/reference/src/models/utils/gaussian_diffusion.py``:
``MixerDiffusion``:1434-2122.  The reference carries two latents —
``img`` in model-1 (HML3D-normalised, per-person-centred) space and ``img2``
in model-2 (InterHuman-normalised) space — through a Python DDIM loop; here
the whole chain is one ``lax.scan`` whose carry is ``(img, img2, rng)`` and
whose ys are the per-step influence histories.

Faithfully reproduced quirks (they shaped the released checkpoints):

* ``process_xstart`` skips re-normalisation at the final step — the t==0
  branch leaves ``pred_xstart2`` in raw motion space (reference :2052-2056);
  implemented with ``lax.cond`` on the (batch-uniform) timestep.
* ``training_losses`` normalises ``x_start2`` and then *discards* the result
  (reference :1590 reassigns from raw ``x_start``) — gated by
  ``faithful_x2_norm_skip``.
* the hinge losses weight by the *inverted* mask (padding frames), reference
  :1477/:1503/:1530 — gated by ``hinge_mask_mode="reference"``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.alignment import center_person_fast
from ..utils.normalizer import Normalizer
from .gaussian import _apply_traj_control, extract, predict_eps_from_xstart, q_sample
from .schedule import DiffusionSchedule


def center_person(x, align: bool):
    """ih -> smpl -> center -> ih per person (contacts zeroed, as upstream).

    Uses the fast algebraic path (utils.alignment.center_person_fast):
    identical output to the reference chain minus the axis-angle detour.
    """
    if not align:
        return x
    return center_person_fast(x)


def process_xstart_dual(
    mixed: jnp.ndarray,
    t0: jnp.ndarray,
    normalizer1: Normalizer,
    normalizer2: Normalizer,
    align: bool,
    nfeats: int = 262,
):
    """Split the raw-space mixed x0 into the two model spaces (:2031-2062).

    Returns ``(pred_xstart, pred_xstart2)``.  At t0==0 the normalisation is
    skipped so pred_xstart2 is raw motion (the value the loop finally returns).
    """
    B, T = mixed.shape[:2]
    # One person-stacked (2B) centring call instead of two B-sized ones:
    # fewer kernels, and the cross-T floor/heading reductions batch.
    both = jnp.concatenate([mixed[..., :nfeats], mixed[..., nfeats:]], axis=0)
    centred = center_person(both, align)
    x1_1, x1_2 = centred[:B], centred[B:]

    def normalised(_):
        ab = normalizer1.forward(centred)
        x2 = normalizer2.forward(mixed.reshape(B, T, 2, -1)).reshape(B, T, -1)
        return jnp.concatenate([ab[:B], ab[B:]], axis=-1), x2

    def raw(_):
        return jnp.concatenate([x1_1, x1_2], axis=-1), mixed

    return jax.lax.cond(t0 > 0, normalised, raw, None)


def ddim_sample_loop_x2(
    mixer_fn: Callable,          # (x, x2, t_orig, mask, cond) -> mixed (raw space)
    s: DiffusionSchedule,
    shape: tuple,
    rng: jax.Array,
    cond: jnp.ndarray,
    *,
    mask=None,
    normalizer1: Normalizer,
    normalizer2: Normalizer,
    align: bool = True,
    eta: float = 0.0,
    noise=None,
    nfeats: int = 262,
    collect_influence: bool = False,
    traj_control=None,
    skip_timesteps: int = 0,
    init_image=None,
    dtype=jnp.float32,
):
    """Full dual-stream DDIM chain as one ``lax.scan`` (reference :1769-1965).

    ``mixer_fn`` is typically the CFG-wrapped mixer
    (:func:`mixermdm_tpu.models.cfg.cfg_model_x2`).  Returns the final
    ``pred_xstart2`` (raw motion space).  With ``collect_influence`` the
    mixer_fn must return ``(mixed, (infl1, infl2))`` and the per-step
    influence histories come back as stacked scan outputs — no extra forward
    (the reference appends to Python lists inside the module,
    mixermdm.py:794-796).

    ``traj_control`` (the reference's ``x_start``, :1874-1882) pins the root
    trajectory dims [0, 2] and [262, 264] of BOTH streams from the given
    motion before every step.  ``skip_timesteps``/``init_image`` warm-start
    the chain exactly as in the single-stream loop (:1854-1860): the init
    image is q-sampled to the first remaining timestep with the initial
    noise draw, and both streams start from it.
    """
    rng, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, shape, dtype) if noise is None else noise
    B = shape[0]
    n_eff = s.num_timesteps - int(skip_timesteps)
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, dtype)
    if init_image is not None:
        t0 = jnp.full((B,), n_eff - 1, jnp.int32)
        img = q_sample(s, init_image.astype(dtype), t0, img)
    img2 = img
    ts = jnp.arange(n_eff - 1, -1, -1)

    def body(carry, i):
        img, img2, rng = carry
        rng, step_rng = jax.random.split(rng)
        t = jnp.full((B,), i, dtype=jnp.int32)
        t_orig = s.timestep_map[t]
        if traj_control is not None:
            img = _apply_traj_control(img, traj_control)
            img2 = _apply_traj_control(img2, traj_control)

        if collect_influence:
            mixed, infl = mixer_fn(img, img2, t_orig, mask, cond)
        else:
            mixed = mixer_fn(img, img2, t_orig, mask, cond)
            infl = None
        pred_x, pred_x2 = process_xstart_dual(
            mixed, i, normalizer1, normalizer2, align, nfeats
        )

        eps = predict_eps_from_xstart(s, img, t, pred_x)
        eps2 = predict_eps_from_xstart(s, img2, t, pred_x2)

        nd = img.ndim
        alpha_bar_prev = extract(s.alphas_cumprod_prev, t, nd)
        if eta == 0.0:
            sigma = jnp.zeros_like(alpha_bar_prev)
        else:
            alpha_bar = extract(s.alphas_cumprod, t, nd)
            sigma = (
                eta
                * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
                * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
            )
        coef = jnp.sqrt(1 - alpha_bar_prev - sigma**2)
        mean1 = pred_x * jnp.sqrt(alpha_bar_prev) + coef * eps
        mean2 = pred_x2 * jnp.sqrt(alpha_bar_prev) + coef * eps2

        if eta == 0.0:
            # Deterministic DDIM: no per-step noise draw at all.
            nxt, nxt2 = mean1, mean2
        else:
            # Shared noise for both streams (reference :1947-1963).
            noise_step = jax.random.normal(step_rng, img.shape, img.dtype)
            nonzero = (t != 0).astype(img.dtype).reshape((B,) + (1,) * (nd - 1))
            nxt = mean1 + nonzero * sigma * noise_step
            nxt2 = mean2 + nonzero * sigma * noise_step

        ys = (pred_x2, infl) if collect_influence else pred_x2
        return (nxt, nxt2, rng), ys

    (_, _, _), ys = jax.lax.scan(body, (img, img2, rng), ts)
    if collect_influence:
        preds, infl = ys
        return preds[-1], infl
    return ys[-1]


def dpmpp_sample_loop_x2(
    mixer_fn: Callable,          # (x, x2, t_orig, mask, cond) -> mixed (raw space)
    s: DiffusionSchedule,
    shape: tuple,
    rng: jax.Array,
    cond: jnp.ndarray,
    *,
    mask=None,
    normalizer1: Normalizer,
    normalizer2: Normalizer,
    align: bool = True,
    noise=None,
    nfeats: int = 262,
    collect_influence: bool = False,
    traj_control=None,
    skip_timesteps: int = 0,
    init_image=None,
    dtype=jnp.float32,
):
    """Dual-stream DPM-Solver++(2M) chain — the fast-sampler twin of
    :func:`ddim_sample_loop_x2`.

    Same model surface and per-step denorm/align/process_xstart pipeline as
    the DDIM loop, but the update is the second-order multistep VP
    data-prediction rule (see :func:`..gaussian.dpmpp_coefficients`), so
    ~half the model calls reach DDIM-50-level quality
    (``scripts/sampler_ab.py`` is the distribution gate).  Both streams are
    one joint ODE and share the step coefficients.  Deterministic; ``rng``
    is consumed only for the initial draw.  The final step is first-order,
    which also keeps the t==0 raw-space x0 (process_xstart_dual's denorm
    skip, reference :2031-2062) out of the multistep correction.
    ``skip_timesteps``/``init_image`` warm-start both streams like the DDIM
    loop.  No reference equivalent (TPU-native addition).
    """
    from .gaussian import dpmpp_coefficients

    rng, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, shape, dtype) if noise is None else noise
    B = shape[0]
    n = s.num_timesteps - int(skip_timesteps)
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, dtype)
    if init_image is not None:
        t0 = jnp.full((B,), n - 1, jnp.int32)
        img = q_sample(s, init_image.astype(dtype), t0, img)
    img2 = img
    sig_ratio, alp_next, phi, c2 = dpmpp_coefficients(s, n)

    def body(carry, xs):
        img, img2, pv, pv2 = carry
        i, j = xs
        t = jnp.full((B,), i, dtype=jnp.int32)
        t_orig = s.timestep_map[t]
        if traj_control is not None:
            img = _apply_traj_control(img, traj_control)
            img2 = _apply_traj_control(img2, traj_control)

        if collect_influence:
            mixed, infl = mixer_fn(img, img2, t_orig, mask, cond)
        else:
            mixed = mixer_fn(img, img2, t_orig, mask, cond)
            infl = None
        pred_x, pred_x2 = process_xstart_dual(
            mixed, i, normalizer1, normalizer2, align, nfeats
        )

        d = (1.0 + c2[j]) * pred_x - c2[j] * pv
        d2 = (1.0 + c2[j]) * pred_x2 - c2[j] * pv2
        nxt = sig_ratio[j] * img - alp_next[j] * phi[j] * d
        nxt2 = sig_ratio[j] * img2 - alp_next[j] * phi[j] * d2

        ys = (pred_x2, infl) if collect_influence else pred_x2
        return (nxt, nxt2, pred_x, pred_x2), ys

    carry0 = (img, img2, jnp.zeros_like(img), jnp.zeros_like(img))
    ts = jnp.arange(n - 1, -1, -1)
    (_, _, _, _), ys = jax.lax.scan(body, carry0, (ts, jnp.arange(n)))
    if collect_influence:
        preds, infl = ys
        return preds[-1], infl
    return ys[-1]


# ---------------------------------------------------------------------------
# Adversarial training losses (reference :1465-1767)
# ---------------------------------------------------------------------------


def _hinge_weight(mask, B, T, mode: str):
    """Per-frame weight for the hinge losses.

    ``mode="reference"`` reproduces upstream exactly: weight = ~(mask>0.5),
    i.e. the loss is averaged over PADDING frames (gaussian_diffusion.py:1503,
    1530 — the shipped checkpoints were trained this way).  ``mode="valid"``
    is the corrected variant averaging over valid frames.
    """
    if mask is None:
        m = jnp.ones((B, T, 1))
    else:
        m = mask.reshape(B, T, -1)[..., :1]
    kpm = (~(m > 0.5)).astype(jnp.float32)
    return kpm if mode == "reference" else 1.0 - kpm


def d_hinge_loss(pred, target, weight):
    """relu(1 - target*pred), weighted mean (reference :1491-1516).

    Reduced in f32 regardless of the logits' compute dtype."""
    loss = jax.nn.relu(1.0 - target * pred.astype(jnp.float32)) * weight
    return loss.sum() / (weight.sum() + 1e-8)


def g_hinge_loss(pred, weight):
    """-pred, weighted mean (reference :1518-1543)."""
    loss = (-pred.astype(jnp.float32)) * weight
    return loss.sum() / (weight.sum() + 1e-8)


def mixer_training_losses(
    mixer_forward: Callable,     # pure fn from models.mixer.make_mixer_forward
    disc_i_apply: Callable,      # (params, x, t, mask, cond) -> (B,T,1)
    disc_I_apply: Callable,
    params: dict,                # {"mixer": {...}, "disc_i": ..., "disc_I": ...}
    s: DiffusionSchedule,
    x_start: jnp.ndarray,        # (B, T, 524) raw GT motion
    t: jnp.ndarray,              # (B,) timesteps
    cond: jnp.ndarray,           # (B, 8*768)
    mask: jnp.ndarray,           # (B, T, 2)
    rng: jax.Array,
    *,
    mode: str,                   # "generator" | "discriminator"
    i_loss_factor: float = 1.0,
    I_loss_factor: float = 2.0,
    l1: float = 0.1,
    align: bool = True,
    normalizer1: Normalizer,
    normalizer2: Normalizer,
    cond_slices: dict,
    nfeats: int = 262,
    faithful_x2_norm_skip: bool = True,
    hinge_mask_mode: str = "reference",
    dropout_rng=None,
    noise=None,
    compute_dtype=None,
):
    """Hinge-GAN losses for generator or discriminator side (:1545-1767).

    The generator/discriminator freeze alternation is handled by the caller
    via ``jax.lax.stop_gradient`` / separate optimizers — not by mutating
    requires_grad flags as the reference does (mixermdm.py:403-431).
    """
    B, T = x_start.shape[:2]
    m = mask.reshape(B, T, -1)[..., :1].astype(jnp.float32)  # (B, T, 1)

    if noise is None:
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)

    # GT into model-1 (per-person centred + HML3D-normalised) space.
    xs1_1 = center_person(x_start[..., :nfeats], align)
    xs1_2 = center_person(x_start[..., nfeats:], align)
    x_start1 = jnp.concatenate(
        [normalizer1.forward(xs1_1), normalizer1.forward(xs1_2)], axis=-1
    )
    # GT into model-2 space — upstream computes the normalisation and then
    # discards it (:1590); reproduce unless the caller opts out.
    if faithful_x2_norm_skip:
        x_start2 = x_start
    else:
        x_start2 = normalizer2.forward(x_start.reshape(B, T, 2, -1)).reshape(B, T, -1)

    x1_t = q_sample(s, x_start1, t, noise)
    x2_t = q_sample(s, x_start2, t, noise)

    t_orig = s.timestep_map[t]
    # Train-mode alternation mirrors the reference's .train()/.eval() flips
    # (mixermdm.py:403-431): the Mixer core drops out only on the G step,
    # discriminators only on the D step; frozen denoisers are always eval.
    gen_train = mode == "generator"
    disc_train = mode == "discriminator"
    rngs_gen = None
    if dropout_rng is not None and gen_train:
        rngs_gen = {"dropout": jax.random.fold_in(dropout_rng, 0)}
    model_output, i_output, _I_output, _infl = mixer_forward(
        params["mixer"], x1_t, t_orig, cond, m, x2_t,
        train=gen_train, rngs=rngs_gen,
    )

    # Center for the individual discriminator heads (:1604-1617).
    mo_i1 = center_person(model_output[..., :nfeats], align)
    mo_i2 = center_person(model_output[..., nfeats:], align)
    io_i1 = center_person(i_output[..., :nfeats], align)
    io_i2 = center_person(i_output[..., nfeats:], align)

    cond_I = cond[:, cond_slices["cond_I"][0] : cond_slices["cond_I"][1]]
    cond_i1 = cond[:, cond_slices["cond_i1"][0] : cond_slices["cond_i1"][1]]
    cond_i2 = cond[:, cond_slices["cond_i2"][0] : cond_slices["cond_i2"][1]]

    # Discriminator compute dtype: bf16 on TPU mirrors the reference's
    # Lightning ``precision='16-mixed'`` harness (scripts/train/mixermdm.py:
    # 337) where every discriminator matmul autocasts to half; the hinge
    # reductions above stay f32.  The geometry (centring) and the q_sample
    # arithmetic are untouched.  G-step gradients flow back through the
    # astype into the (f32) mixer graph.
    cd = ((lambda a: a.astype(compute_dtype)) if compute_dtype is not None
          else (lambda a: a))

    w = _hinge_weight(mask, B, T, hinge_mask_mode)
    losses = {}

    # Pure metric, never part of ``total``: mean influence weight over the
    # valid frames — the curve the reference's wandb harness watches to see
    # the mixer drift away from its 0.5-ish init (mixermdm.py:803-804 returns
    # the influence tensors for exactly this purpose).
    infl1, infl2 = _infl
    denom = jnp.sum(m) * infl1.shape[-1] + 1e-8
    losses["influence_mean"] = jax.lax.stop_gradient(
        (jnp.sum(infl1 * m) + jnp.sum(infl2 * m)) / (2.0 * denom)
    )

    if mode == "generator":
        # Freeze discriminators: gradients flow only into the mixer.
        dpi = jax.lax.stop_gradient(params["disc_i"])
        dpI = jax.lax.stop_gradient(params["disc_I"])
        g_i1 = g_hinge_loss(disc_i_apply(dpi, cd(mo_i1), t_orig, m, cd(cond_i1)), w) * i_loss_factor
        g_i2 = g_hinge_loss(disc_i_apply(dpi, cd(mo_i2), t_orig, m, cd(cond_i2)), w) * i_loss_factor
        g_I = g_hinge_loss(disc_I_apply(dpI, cd(model_output), t_orig, m, cd(cond_I)), w) * I_loss_factor
        del disc_train
        losses.update(generator_i1=g_i1, generator_i2=g_i2, generator_I=g_I)

        mean_loss = (g_i1 + g_i2 + g_I) / (i_loss_factor * 2 + I_loss_factor)
        penalty = l1 * (
            (g_i1 - mean_loss) ** 2
            + (g_i2 - mean_loss) ** 2
            + ((g_I / I_loss_factor - mean_loss) ** 2) * I_loss_factor
        )
        losses["generator_total"] = mean_loss + penalty
        losses["total"] = losses["generator_total"]

    elif mode == "discriminator":
        # Freeze the generator: its outputs are constants for the D step.
        mo_i1, mo_i2 = jax.lax.stop_gradient((mo_i1, mo_i2))
        io_i1, io_i2 = jax.lax.stop_gradient((io_i1, io_i2))
        model_output = jax.lax.stop_gradient(model_output)
        I_output = jax.lax.stop_gradient(_I_output)

        def d_pair(apply, p, real_x, fake_x, c, idx):
            def r(k):
                if dropout_rng is None:
                    return None
                return {"dropout": jax.random.fold_in(dropout_rng, idx * 2 + k)}

            real = d_hinge_loss(apply(p, cd(real_x), t_orig, m, cd(c), train=disc_train, rngs=r(0)), 1.0, w)
            fake = d_hinge_loss(apply(p, cd(fake_x), t_orig, m, cd(c), train=disc_train, rngs=r(1)), -1.0, w)
            return (real + fake) / 2

        d_i1 = d_pair(disc_i_apply, params["disc_i"], io_i1, mo_i1, cond_i1, 1) * i_loss_factor
        d_i2 = d_pair(disc_i_apply, params["disc_i"], io_i2, mo_i2, cond_i2, 2) * i_loss_factor
        d_I = d_pair(disc_I_apply, params["disc_I"], I_output, model_output, cond_I, 3) * I_loss_factor
        losses.update(discriminator_i1=d_i1, discriminator_i2=d_i2, discriminator_I=d_I)

        mean_loss = (d_i1 + d_i2 + d_I) / (i_loss_factor * 2 + I_loss_factor)
        penalty = l1 * (
            (d_i1 - mean_loss) ** 2
            + (d_i2 - mean_loss) ** 2
            + ((d_I / I_loss_factor - mean_loss) ** 2) * I_loss_factor
        )
        losses["discriminator_total"] = mean_loss + penalty
        losses["total"] = losses["discriminator_total"]
    else:
        raise ValueError(mode)

    return losses
