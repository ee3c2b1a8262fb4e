from .build import build_bvh, MAX_LEAF
