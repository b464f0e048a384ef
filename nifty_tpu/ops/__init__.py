from .harmonic import (
    fftn,
    fourier_mode_distributor,
    fourier_mode_lengths,
    hartley,
    hartley_via_c2c,
    ifftn,
)
from .healpix_sht import HEALPixSHT
