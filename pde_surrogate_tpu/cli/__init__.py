"""Drivers: the six reference entry points + the dataset factory."""
