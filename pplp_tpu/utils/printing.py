"""Pretty-printers (reference C11, ``include/examples.h:58-237``):
parameter banner, vector/matrix previews."""

from __future__ import annotations

__all__ = ["print_parameters", "print_vector", "print_matrix", "print_line"]


def print_parameters(ctx, out=print):
    """SEAL-style banner (examples.h:58-108) for a BFVContext."""
    parms = ctx.parms
    bits = [q.bit_length() for q in parms.coeff_modulus]
    out("/")
    out("| Encryption parameters :")
    out(f"|   scheme: {parms.scheme.upper()}")
    out(f"|   poly_modulus_degree: {parms.poly_modulus_degree}")
    out(
        f"|   coeff_modulus size: {sum(bits)} ({' + '.join(map(str, bits))}) bits"
    )
    out(f"|   plain_modulus: {parms.plain_modulus}")
    out("\\")


def print_line(line_number: int, out=print):
    out(f"Line {line_number:3d} --> ", end="") if out is print else out(
        f"Line {line_number:3d} --> "
    )


def print_vector(vec, print_size: int = 4, prec: int = 3, out=print):
    """Head ... tail preview (examples.h:136-183)."""
    vec = list(vec)
    n = len(vec)
    fmt = lambda v: f"{float(v):.{prec}f}" if isinstance(v, float) else str(v)
    if n <= 2 * print_size:
        body = ", ".join(fmt(v) for v in vec)
        out(f"    [ {body} ]")
    else:
        head = ", ".join(fmt(v) for v in vec[:print_size])
        tail = ", ".join(fmt(v) for v in vec[-print_size:])
        out(f"    [ {head}, ..., {tail} ]")


def print_matrix(matrix, row_size: int, print_size: int = 5, out=print):
    """Two-row batched-plaintext view (examples.h:185-218)."""
    for r in range(2):
        row = matrix[r * row_size : (r + 1) * row_size]
        head = ", ".join(str(v) for v in row[:print_size])
        tail = ", ".join(str(v) for v in row[-print_size:])
        out(f"    [ {head}, ..., {tail} ]")
