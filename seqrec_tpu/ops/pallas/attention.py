"""Placeholder — Pallas attention kernel lands in the kernels milestone."""


def supported(*args, **kwargs):
    return False
