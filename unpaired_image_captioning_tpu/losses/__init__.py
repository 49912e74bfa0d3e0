"""Losses / rewards: XE caption loss, SCST policy gradient, NMT NLL,
label smoothing, pivot embedding-alignment (Weight_Trans) losses."""
