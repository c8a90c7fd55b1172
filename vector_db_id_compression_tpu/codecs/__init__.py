"""ID codecs: ROC (bits-back rANS), Elias-Fano, wavelet tree, packed bits."""
