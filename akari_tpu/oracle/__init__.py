from .renderer import render_oracle
