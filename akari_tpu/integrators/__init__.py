from .path import PathConfig, render, render_sample
from .ao import AOConfig, render_ao
