from . import vecmath, transform, aabb, rng, distribution, spectrum
