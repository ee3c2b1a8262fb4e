from .intersect import intersect, occlude, moller_trumbore, Hit
