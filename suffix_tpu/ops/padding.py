"""Static-shape padding policy for XLA-compiled kernels.

XLA compiles one executable per input shape, so variable-length texts and
query batches are padded to a small set of bucket sizes. Texts are padded
with the fill value ``PAD = -1``, which is strictly below every real byte
(0..255). This makes padding act exactly like the implicit sentinel of the
reference construction (src/table.rs:814-819): a suffix that runs off the
end of the real text compares below any suffix that still has real bytes,
which is precisely "shorter prefix sorts first" byte-lexicographic order.
"""

from __future__ import annotations

PAD = -1  # sorts strictly below every real byte value


def bucket_size(n: int, minimum: int = 16) -> int:
    """Round ``n`` up to the next power of two (>= minimum).

    Keeps the number of distinct compiled shapes at O(log max_n).
    """
    if n <= minimum:
        return minimum
    return 1 << (n - 1).bit_length()


def bucket_size_fine(n: int, minimum: int = 16) -> int:
    """Finer-grained bucketing: next multiple of a power-of-two step with
    at most 12.5% padding overhead. Used for large texts where a full
    power-of-two round-up would waste HBM.
    """
    if n <= minimum:
        return minimum
    # step = 2^(bit_length-3) -> between 1/8 and 1/4 of n
    step = 1 << max(0, n.bit_length() - 3)
    return ((n + step - 1) // step) * step
