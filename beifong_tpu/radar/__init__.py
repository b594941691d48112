from .waveform import Waveform, cw, pulse, linfmcw  # noqa: F401
from .endpoints import (  # noqa: F401
    TransmitterSpec, ReceiverSpec, TransmitterTable, ReceiverTable,
    wigner_transmitter, phased_transmitter, area_transmitter,
    wigner_receiver, phased_receiver, omni_receiver, ADCConfig,
)
