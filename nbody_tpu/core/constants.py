"""Physical and algorithmic constants, matching the reference exactly.

Reference provenance:
* BIG_G = 1.0            — serial/exhaustive.c:24 (SI value 6.67e-11 commented
                           out at serial/exhaustive.c:23)
* THETA = 0.5            — serial/barnes-hut.c:40 ("0 = no approximation",
                           openmp/barnes-hut.c:53)
* SOFTENING_SQ = 0.01    — the `+ 0.01` added to |r|^2 before the -3/2 power
                           in every force kernel (serial/exhaustive.c:172,
                           serial/barnes-hut.c:372, cuda/exhaustive.cu:321)

The reference hard-codes these at compile time; here they are defaults that
every force function accepts as overridable keyword arguments.
"""

BIG_G: float = 1.0
BIG_G_SI: float = 6.67e-11  # the commented-out alternative, serial/exhaustive.c:23

THETA: float = 0.5

# Softening is added to the *squared* distance: inv_r3 = (|r|^2 + eps2)^(-3/2).
SOFTENING_SQ: float = 0.01
