"""Skeleton FK/IK over the HML kinematic chain + uniform retargeting.

Parity source ``/root/reference/src/utils/skeleton.py``: ``Skeleton`` (FK
:108-197, IK :67-105, offsets :45-64) and ``uniform_skeleton``:199 (leg-ratio
rescaling + IK/FK retarget).  Re-designed as a stateless dataclass with
vectorised numpy math — host-side preprocessing, not jit code.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .constants import FACE_JOINT_INDX, HML_KINEMATIC_CHAIN, HML_RAW_OFFSETS
from .features import _qbetween_np, _qinv_np, _qrot_np

# Upper-leg / lower-leg offset indices used for the scale ratio
# (reference paramUtil L_IDX1/L_IDX2: left hip and left knee).
L_IDX1, L_IDX2 = 5, 8


def _qmul_np(q, r):
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


@dataclasses.dataclass
class Skeleton:
    raw_offsets: np.ndarray = dataclasses.field(
        default_factory=lambda: HML_RAW_OFFSETS.copy()
    )
    kinematic_tree: tuple = HML_KINEMATIC_CHAIN

    def __post_init__(self):
        n = len(self.raw_offsets)
        parents = [0] * n
        parents[0] = -1
        for chain in self.kinematic_tree:
            for j in range(1, len(chain)):
                parents[chain[j]] = chain[j - 1]
        self.parents = parents
        self.offset: np.ndarray | None = None

    @property
    def njoints(self) -> int:
        return len(self.raw_offsets)

    def offsets_from_joints(self, joints: np.ndarray) -> np.ndarray:
        """Bone-length-scaled unit offsets from one pose (reference :55-64)."""
        offsets = self.raw_offsets.astype(np.float64).copy()
        for i in range(1, self.njoints):
            bone = np.linalg.norm(joints[i] - joints[self.parents[i]])
            offsets[i] = bone * offsets[i]
        self.offset = offsets
        return offsets

    def inverse_kinematics(self, joints: np.ndarray, face_joint_idx=FACE_JOINT_INDX,
                           smooth_forward: bool = False) -> np.ndarray:
        """(T, J, 3) positions -> (T, J, 4) local quaternions (reference :67-105)."""
        l_hip, r_hip, sdr_r, sdr_l = face_joint_idx
        across = (joints[:, r_hip] - joints[:, l_hip]) + (joints[:, sdr_r] - joints[:, sdr_l])
        across = across / np.sqrt((across**2).sum(-1) + 1e-12)[:, None]
        forward = np.cross(np.array([[0, 1, 0]]), across, axis=-1)
        if smooth_forward:
            from scipy.ndimage import gaussian_filter1d

            forward = gaussian_filter1d(forward, 20, axis=0, mode="nearest")
        forward = forward / np.sqrt((forward**2).sum(-1) + 1e-12)[..., None]

        target = np.tile(np.array([[0.0, 0.0, 1.0]]), (len(forward), 1))
        root_quat = _qbetween_np(forward, target)
        root_quat[0] = np.array([1.0, 0.0, 0.0, 0.0])

        quat_params = np.zeros(joints.shape[:-1] + (4,))
        quat_params[:, 0] = root_quat
        for chain in self.kinematic_tree:
            R = root_quat
            for j in range(len(chain) - 1):
                u = np.tile(self.raw_offsets[chain[j + 1]][None], (len(joints), 1)).astype(np.float64)
                v = joints[:, chain[j + 1]] - joints[:, chain[j]]
                v = v / np.sqrt((v**2).sum(-1) + 1e-12)[:, None]
                rot_u_v = _qbetween_np(u, v)
                R_loc = _qmul_np(_qinv_np(R), rot_u_v)
                quat_params[:, chain[j + 1]] = R_loc
                R = _qmul_np(R, R_loc)
        return quat_params

    def forward_kinematics(self, quat_params: np.ndarray, root_pos: np.ndarray,
                           do_root_rotation: bool = True) -> np.ndarray:
        """(T, J, 4) local quats + (T, 3) root -> (T, J, 3) positions
        (reference :130-152)."""
        assert self.offset is not None, "set offsets first (offsets_from_joints)"
        T = quat_params.shape[0]
        joints = np.zeros(quat_params.shape[:-1] + (3,))
        joints[:, 0] = root_pos
        for chain in self.kinematic_tree:
            if do_root_rotation:
                R = quat_params[:, 0]
            else:
                R = np.tile(np.array([[1.0, 0, 0, 0]]), (T, 1))
            for i in range(1, len(chain)):
                R = _qmul_np(R, quat_params[:, chain[i]])
                offset_vec = np.tile(self.offset[chain[i]][None], (T, 1))
                joints[:, chain[i]] = _qrot_np(R, offset_vec) + joints[:, chain[i - 1]]
        return joints


def uniform_skeleton(positions: np.ndarray, target_offsets: np.ndarray | None = None,
                     target_skeleton_path: str | None = None) -> np.ndarray:
    """Retarget a motion onto the canonical skeleton (reference :199-235).

    ``target_offsets``: (J, 3) bone offsets, or ``target_skeleton_path`` to a
    raw example motion providing them.  Scale = leg-length ratio, then IK on
    the source and FK with the target offsets.
    """
    skel = Skeleton()
    if target_offsets is None:
        if target_skeleton_path is None:
            raise ValueError("need target_offsets or target_skeleton_path")
        example = np.load(target_skeleton_path).reshape(-1, skel.njoints, 3)
        target_offsets = Skeleton().offsets_from_joints(example[0])

    src_offsets = Skeleton().offsets_from_joints(positions[0])
    src_leg = np.abs(src_offsets[L_IDX1]).max() + np.abs(src_offsets[L_IDX2]).max()
    tgt_leg = np.abs(target_offsets[L_IDX1]).max() + np.abs(target_offsets[L_IDX2]).max()
    scale = tgt_leg / src_leg

    tgt_root = positions[:, 0] * scale
    quat_params = skel.inverse_kinematics(positions)
    skel.offset = np.asarray(target_offsets, np.float64)
    return skel.forward_kinematics(quat_params, tgt_root)
