"""Offline preprocessing scripts (parity: reference scripts/)."""
