"""Engine layer: descriptors, config, dispatch routing, stats.

TPU-native analogue of the reference's MFABridge layer
(/root/reference/Sources/MFABridge/MFABridge.swift) — here the "pipeline cache"
is the jit cache keyed on static shapes/config, and "dispatch" is pure-Python
route selection recorded in DispatchStats.
"""
