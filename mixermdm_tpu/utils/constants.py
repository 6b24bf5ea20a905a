"""Skeleton / motion-representation constants.

Parity source: ``/root/reference/src/utils/paramUtil.py:5-148``.

The 262-d InterHuman feature layout (reference
``src/utils/utils.py:150-160``)::

    [ 0:66)    22 joint xyz positions
    [66:132)   22 joint xyz velocities
    [132:258)  21 joint 6d rotations
    [258:262)  4 foot-contact labels (FID_L then FID_R)
"""

import numpy as np

NUM_JOINTS = 22
NUM_ROT_JOINTS = 21
FEATS_DIM = 262          # 66 + 66 + 126 + 4
POS_DIM = NUM_JOINTS * 3
VEL_DIM = NUM_JOINTS * 3
ROT_DIM = NUM_ROT_JOINTS * 6
CONTACT_DIM = 4

# Face direction joints: r_hip, l_hip, sdr_r, sdr_l  (paramUtil.py:89)
FACE_JOINT_INDX = (2, 1, 17, 16)
# Right / left foot joint ids (paramUtil.py:88)
FID_R = (8, 11)
FID_L = (7, 10)
# Feet joint ids used by the geometric foot-contact loss (losses.py:151)
GEOMETRIC_LOSS_FIDS = (7, 10, 8, 11)

HML_KINEMATIC_CHAIN = (
    (0, 2, 5, 8, 11),
    (0, 1, 4, 7, 10),
    (0, 3, 6, 9, 12, 15),
    (9, 14, 17, 19, 21),
    (9, 13, 16, 18, 20),
)

HML_RAW_OFFSETS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, -1, 0],
        [0, 1, 0], [0, -1, 0], [0, -1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1],
        [0, 1, 0], [1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, -1, 0], [0, -1, 0],
        [0, -1, 0], [0, -1, 0], [0, -1, 0], [0, -1, 0],
    ],
    dtype=np.float32,
)

# Body-joint left/right swap chains (utils.py:196-199).
SWAP_RIGHT_CHAIN = (2, 5, 8, 11, 14, 17, 19, 21)
SWAP_LEFT_CHAIN = (1, 4, 7, 10, 13, 16, 18, 20)

# Default max sequence length (interhuman.py:23) and window sizes.
MAX_FRAMES = 300
INFER_WINDOW = 299

# CLIP text-conditioning dims.
CLIP_VIT_L_DIM = 768
CLIP_VIT_B_DIM = 512
