"""Placeholder — Pallas softmax_head kernel lands in the kernels milestone."""


def supported(*args, **kwargs):
    return False
