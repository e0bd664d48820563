"""Placeholder — Pallas gather kernel lands in the kernels milestone."""


def supported(*args, **kwargs):
    return False
