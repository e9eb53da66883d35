"""Experimental / parked kernels — NOT on any production path.

Code here records measured negative results worth keeping (with their
parity tests) without cluttering the production ops surface.  See each
module's docstring for the measurement that parked it.
"""
