from .inverse import InverseConfig, inverse_render, scene_params, apply_params
