from .mesh import make_ray_mesh
from .render import render_sharded, loss_and_image_sharded
