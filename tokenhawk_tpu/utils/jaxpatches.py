"""Runtime workarounds for axon-relay backend bugs (in-memory only; no
site-packages edits).

int4 layout metadata (jax 0.9.0 + 'axon' PJRT relay)
----------------------------------------------------
S4 device arrays come back with
``Layout(sub_byte_element_size_in_bits=0)`` while every compiled
executable expects ``...=4`` for the same (identical) packed tiling
``((64, 128), (8, 1))``.  The buffer itself IS bit-packed (verified:
XLA memory analysis reports 0.5 bytes/element), only the Python-side
metadata is wrong.  The mismatch makes ``_array_shard_arg`` issue a
relayout ``device_put`` whose own jit re-enters the same path ->
``RecursionError: Recursively calling jit``, so S4 arrays can never
cross a jit boundary without this patch.

The patch relaxes ``Layout.__eq__``: two layouts whose
``major_to_minor`` and ``tiling`` agree, and whose sub-byte sizes are
{0, n} with the tiling carrying a trailing packing tile ``(8, 1)``
(the signature of a packed sub-byte layout), compare equal.  A
genuinely different layout still compares unequal, so real relayouts
still happen.
"""

from __future__ import annotations

_applied = False


def apply() -> None:
    global _applied
    if _applied:
        return
    _applied = True

    from jax._src.layout import Layout

    orig_eq = Layout.__eq__

    def _eq(self, other):
        if orig_eq(self, other):
            return True
        if not isinstance(other, Layout):
            return NotImplemented
        if (
            self.major_to_minor == other.major_to_minor
            and self.tiling == other.tiling
            and self.tiling
            and tuple(self.tiling[-1]) == (8, 1)
            and 0 in (self._sub_byte_element_size_in_bits,
                      other._sub_byte_element_size_in_bits)
        ):
            return True
        return False

    Layout.__eq__ = _eq
    # __hash__ already ignores nothing — keep hash consistent with the
    # relaxed equality by dropping sub_byte from it for packed tilings.
    orig_hash = Layout.__hash__

    def _hash(self):
        if self.tiling and tuple(self.tiling[-1]) == (8, 1):
            return hash((self.major_to_minor, self.tiling))
        return orig_hash(self)

    Layout.__hash__ = _hash
