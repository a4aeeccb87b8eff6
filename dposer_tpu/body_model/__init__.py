from .part_indices import BODY_JOINT_NAMES, BodyPartIndices
