"""Motion-representation converters and batch alignment/canonicalisation.

These are the per-denoising-step geometry ops of the Mixer hot path — they run
*inside* the jitted DDIM ``lax.scan`` — so everything is pure jnp, batched,
with no data-dependent Python control flow.

Parity source ``/root/reference/src/utils/alignment.py``: ``ih_to_smpl``:11,
``smpl_to_ih``:41, ``align_trajectories``:69, ``align_motions``:108,
``center_motion``:161.

Layout notes (faithfully reproduced, including quirks):

* "IH" format is the 262-d InterHuman vector
  ``[66 pos | 66 vel | 126 rot6d | 4 contacts]``.
* "SMPL" format is 205-d: ``[66 pos | 66 vel | 69 axis-angle (21 body + 2
  zero hand joints) | 4 contacts]``.
* ``center_motion`` / ``align_motions`` return **201-d** tensors — they drop
  the 4 contact dims (reference alignment.py:149-156, 213-220).  A subsequent
  ``smpl_to_ih`` then reads its "contacts" from the zero hand-joint padding,
  so contacts come out as zeros.  This matches upstream behaviour exactly and
  matters for checkpoint parity.
"""

from __future__ import annotations

import contextlib as _contextlib

import jax
import jax.numpy as jnp

from .quaternions import qbetween, qrot
from .rotations import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    matrix_to_rotation_6d,
    rotation_6d_to_matrix,
)
from .constants import FACE_JOINT_INDX

# --------------------------------------------------------------------------
# Multi-mesh sharding hint.  Under a dp x tp (2-D) mesh, GSPMD propagates the
# tensor-parallel "model" axis from the denoiser matmuls onto the tiny
# per-step geometry tensors here; the root-trajectory SLICES then need a
# model-axis -> data-axis resharding the partitioner can only do by
# "involuntary full rematerialization" (spmd_partitioner.cc warnings in the
# dryrun).  Pinning the (B, T, J, 3) position/velocity tensors to plain
# batch-over-"data" sharding keeps the whole geometry pool on the data axis,
# where every op partitions trivially.  Identity when no mesh scope is set
# (single chip, 1-D dp) — a with_sharding_constraint never changes math.
# --------------------------------------------------------------------------

_BATCH_MESH = None


def set_geometry_batch_sharding(mesh=None, data_axis: str = "data") -> None:
    """Scope the geometry ops' batch-axis sharding constraint to ``mesh``.

    Called by the trainers and multi-device sampling paths when running over
    a 2-D (dp x tp) mesh; ``None`` clears.  Recorded at TRACE time — set it
    before the first jit of the step/chain."""
    global _BATCH_MESH
    _BATCH_MESH = None if mesh is None else (mesh, data_axis)


@_contextlib.contextmanager
def geometry_batch_scope(mesh, data_axis: str = "data", model_axis: str = "model"):
    """Apply the geometry batch-sharding constraint while tracing under a
    dp x tp mesh; no-op for ``None``, 1-D (pure dp) meshes, or a trivial
    model axis.  Scoped (set/restore) so one process can trace programs over
    several different meshes — a bare global would leak a dead mesh into the
    next trace."""
    if (
        mesh is None
        or model_axis not in getattr(mesh, "axis_names", ())
        or data_axis not in mesh.axis_names
        or mesh.shape[model_axis] <= 1
    ):
        yield
        return
    global _BATCH_MESH
    prev = _BATCH_MESH
    _BATCH_MESH = (mesh, data_axis)
    try:
        yield
    finally:
        _BATCH_MESH = prev


def _bc(x: jnp.ndarray) -> jnp.ndarray:
    """Constrain the leading (batch) axis to the data mesh axis, everything
    else replicated; identity outside a mesh scope or on indivisible batch."""
    if _BATCH_MESH is None:
        return x
    mesh, da = _BATCH_MESH
    if da not in mesh.axis_names or x.shape[0] % mesh.shape[da] != 0:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    spec = PartitionSpec(da, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def orthonormalize_rot6d(motion: jnp.ndarray) -> jnp.ndarray:
    """Replace the 126 rot6d dims by their Gram-Schmidt projection.

    Algebraically identical to the reference's rot6d -> axis-angle -> rot6d
    round trip through ``ih_to_smpl``/``smpl_to_ih`` (the sign flips cancel
    and matrix<->axis-angle is exact for rotation matrices), but skips the
    trig-heavy axis-angle conversions — this runs 100x per sample inside the
    DDIM scan.

    Computed directly as ``[b1, b2]`` with ``b1 = a1/|a1|``,
    ``b2 = (a2 - (b1·a2) b1)/|...|`` — the 6d->matrix->6d round trip builds
    (and then discards) the third row ``b1 x b2`` and materialises a
    (..., 21, 3, 3) tensor for nothing; per-step this op runs on 4 streams
    of the mixer hot path.
    """
    lead = motion.shape[:-1]
    rot = motion[..., 132:258].reshape(lead + (21, 6))
    # The on-disk 6d layout is INTERLEAVED [r00,r10,r01,r11,r02,r12]
    # (rotations.rotation_6d_to_matrix docstring) — deinterleave, project,
    # re-interleave, matching matrix_to_rotation_6d's row transpose.
    a1 = rot[..., 0::2]
    a2 = rot[..., 1::2]
    b1 = a1 * jax.lax.rsqrt((a1 * a1).sum(-1, keepdims=True) + 1e-12)
    a2p = a2 - (b1 * a2).sum(-1, keepdims=True) * b1
    b2 = a2p * jax.lax.rsqrt((a2p * a2p).sum(-1, keepdims=True) + 1e-12)
    rot = jnp.stack([b1, b2], axis=-1).reshape(lead + (126,))
    return jnp.concatenate([motion[..., :132], rot, motion[..., 258:]], axis=-1)


def center_person_fast(motion: jnp.ndarray) -> jnp.ndarray:
    """Fast path for ``smpl_to_ih(center_motion(ih_to_smpl(x)))`` on (B,T,262).

    Equivalent output: centred positions/velocities, orthonormalised
    rotations, contacts zeroed (the reference chain's contact-drop quirk).
    """
    B, T = motion.shape[:2]
    pos = _bc(motion[..., :66].reshape(B, T, 22, 3))
    vel = _bc(motion[..., 66:132].reshape(B, T, 22, 3))

    floor = pos[..., 1].min(axis=(1, 2))
    pos = pos.at[..., 1].add(-floor[:, None, None])
    root_init = pos[:, 0]
    root_xz = root_init[:, 0] * jnp.asarray([1.0, 0.0, 1.0], dtype=motion.dtype)
    pos = pos - root_xz[:, None, None, :]

    r_hip, l_hip = FACE_JOINT_INDX[:2]
    across = root_init[:, r_hip] - root_init[:, l_hip]
    across = across / jnp.sqrt((across**2).sum(axis=-1, keepdims=True) + 1e-12)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], dtype=motion.dtype), across.shape)
    forward = jnp.cross(up, across)
    forward = forward / jnp.sqrt((forward**2).sum(axis=-1, keepdims=True) + 1e-12)
    target = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype=motion.dtype), forward.shape)
    root_quat = qbetween(forward, target)
    root_quat = jnp.broadcast_to(root_quat[:, None, None, :], (B, T, 22, 4))
    pos = qrot(root_quat, pos)
    vel = qrot(root_quat, vel)

    rot = orthonormalize_rot6d(motion)[..., 132:258]
    contacts = jnp.zeros(motion.shape[:-1] + (4,), motion.dtype)
    return jnp.concatenate(
        [pos.reshape(B, T, 66), vel.reshape(B, T, 66), rot, contacts], axis=-1
    )


def align_persons_fast(ref262: jnp.ndarray, mov262: jnp.ndarray, mask=None):
    """Fast path for the mixer's per-step ``ih_to_smpl -> align_motions ->
    smpl_to_ih`` pair on (B, T, 262) person streams.

    Returns ``(ref_out, mov_out)`` matching the reference chain: the moving
    stream is position+heading aligned with contacts zeroed; the reference
    stream passes through with rotations orthonormalised and contacts kept.
    """
    B, T = ref262.shape[:2]
    pos_r = _bc(ref262[..., :66].reshape(B, T, 22, 3))
    pos_m = _bc(mov262[..., :66].reshape(B, T, 22, 3))
    vel_m = _bc(mov262[..., 66:132].reshape(B, T, 22, 3))

    delta = pos_r[:, 0, 0] - pos_m[:, 0, 0]
    pos_m = pos_m + delta[:, None, None, :]
    alignment = align_trajectories(pos_r[:, :, 0], pos_m[:, :, 0], mask)
    pos_m = qrot(alignment, pos_m)
    delta = pos_r[:, 0, 0] - pos_m[:, 0, 0]
    pos_m = pos_m + delta[:, None, None, :]
    vel_m = qrot(alignment, vel_m)

    mov_rot = orthonormalize_rot6d(mov262)[..., 132:258]
    zeros = jnp.zeros((B, T, 4), mov262.dtype)
    mov_out = jnp.concatenate(
        [pos_m.reshape(B, T, 66), vel_m.reshape(B, T, 66), mov_rot, zeros], axis=-1
    )
    ref_out = orthonormalize_rot6d(ref262)
    return ref_out, mov_out


def ih_to_smpl(motion: jnp.ndarray) -> jnp.ndarray:
    """(..., T, 262) IH -> (..., T, 205) SMPL (alignment.py:11-39)."""
    lead = motion.shape[:-1]
    poses = motion[..., 132:258].reshape(lead + (21, 6))
    poses = -matrix_to_axis_angle(rotation_6d_to_matrix(poses))
    poses = poses.reshape(lead + (63,))
    zero_pad = jnp.zeros(lead + (6,), dtype=motion.dtype)
    return jnp.concatenate(
        [motion[..., :132], poses, zero_pad, motion[..., -4:]], axis=-1
    )


def smpl_to_ih(motion: jnp.ndarray) -> jnp.ndarray:
    """(..., T, >=201) SMPL -> (..., T, 262) IH (alignment.py:41-67).

    Reads 23 axis-angle joints at [132:201] and the trailing 4 dims as
    contacts — if the input is the 201-d output of ``center_motion`` /
    ``align_motions`` those trailing dims are the zero hand-joints, exactly as
    upstream.
    """
    lead = motion.shape[:-1]
    poses = motion[..., 132:201].reshape(lead + (23, 3))
    poses = matrix_to_rotation_6d(axis_angle_to_matrix(-poses))
    poses = poses.reshape(lead + (138,))[..., :126]  # drop 2 hand joints
    return jnp.concatenate([motion[..., :132], poses, motion[..., -4:]], axis=-1)


def align_trajectories(
    t1: jnp.ndarray, t2: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Rotation quats aligning root trajectory t2 onto t1 (alignment.py:69-105).

    t1, t2: (B, T, 3) root positions. Returns (B, T, 22, 4).
    """
    B, T = t1.shape[:2]
    if mask is None:
        v1 = t1[:, -1] - t1[:, 0]
        v2 = t2[:, -1] - t2[:, 0]
    else:
        lengths = mask.reshape(B, T, -1)[..., 0].sum(axis=1).astype(jnp.int32)
        idx = jnp.clip(lengths - 1, 0, T - 1)
        v1 = jnp.take_along_axis(t1, idx[:, None, None], axis=1)[:, 0] - t1[:, 0]
        v2 = jnp.take_along_axis(t2, idx[:, None, None], axis=1)[:, 0] - t2[:, 0]

    # Heading only: zero the vertical component.
    v1 = v1 * jnp.asarray([1.0, 0.0, 1.0], dtype=t1.dtype)
    v2 = v2 * jnp.asarray([1.0, 0.0, 1.0], dtype=t1.dtype)
    v1 = v1 / jnp.sqrt((v1**2).sum(axis=1, keepdims=True) + 1e-8)
    v2 = v2 / jnp.sqrt((v2**2).sum(axis=1, keepdims=True) + 1e-8)

    rot_quat = qbetween(v2, v1)  # (B, 4)
    return jnp.broadcast_to(rot_quat[:, None, None, :], (B, T, 22, 4))


def align_motions(
    motion1: jnp.ndarray, motion2: jnp.ndarray, mask: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Position+heading-align motion2 onto motion1 (alignment.py:108-158).

    Inputs (B, T, >=201) in SMPL layout; returns ``(motion1, motion2_aligned)``
    where the aligned motion is 201-d (contacts dropped, as upstream).
    """
    B, T = motion1.shape[:2]
    pos1 = motion1[..., :66].reshape(B, T, 22, 3)
    pos2 = motion2[..., :66].reshape(B, T, 22, 3)
    vel2 = motion2[..., 66:132].reshape(B, T, 22, 3)
    rot2 = motion2[..., 132:201]

    # Translate start roots together.
    delta = pos1[:, 0, 0] - pos2[:, 0, 0]
    pos2 = pos2 + delta[:, None, None, :]

    alignment = align_trajectories(pos1[:, :, 0], pos2[:, :, 0], mask)
    pos2 = qrot(alignment, pos2)
    delta = pos1[:, 0, 0] - pos2[:, 0, 0]
    pos2 = pos2 + delta[:, None, None, :]
    vel2 = qrot(alignment, vel2)

    motion2_aligned = jnp.concatenate(
        [pos2.reshape(B, T, 66), vel2.reshape(B, T, 66), rot2], axis=-1
    )
    return motion1, motion2_aligned


def center_motion(motion: jnp.ndarray) -> jnp.ndarray:
    """Batch canonicalisation (alignment.py:161-222).

    (B, T, >=201) SMPL layout -> (B, T, 201): floor-grounded, XZ-origin at the
    first root, initially facing Z+.  Contacts dropped (upstream quirk).
    """
    B, T = motion.shape[:2]
    pos = motion[..., :66].reshape(B, T, 22, 3)
    vel = motion[..., 66:132].reshape(B, T, 22, 3)
    rot = motion[..., 132:201]

    floor = pos[..., 1].min(axis=(1, 2))
    pos = pos.at[..., 1].add(-floor[:, None, None])

    root_init = pos[:, 0]  # (B, 22, 3)
    root_xz = root_init[:, 0] * jnp.asarray([1.0, 0.0, 1.0], dtype=motion.dtype)
    pos = pos - root_xz[:, None, None, :]

    r_hip, l_hip = FACE_JOINT_INDX[:2]
    across = root_init[:, r_hip] - root_init[:, l_hip]
    # eps-stabilised norms: keeps the degenerate zero pose (fresh zero-init
    # model output) finite; identical on real data.
    across = across / jnp.sqrt((across**2).sum(axis=-1, keepdims=True) + 1e-12)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], dtype=motion.dtype), across.shape)
    forward = jnp.cross(up, across)
    forward = forward / jnp.sqrt((forward**2).sum(axis=-1, keepdims=True) + 1e-12)
    target = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype=motion.dtype), forward.shape)

    root_quat = qbetween(forward, target)  # (B, 4)
    root_quat = jnp.broadcast_to(root_quat[:, None, None, :], (B, T, 22, 4))
    pos = qrot(root_quat, pos)
    vel = qrot(root_quat, vel)

    return jnp.concatenate(
        [pos.reshape(B, T, 66), vel.reshape(B, T, 66), rot], axis=-1
    )
