from . import vecmath, transform, rng, distribution, spectrum
