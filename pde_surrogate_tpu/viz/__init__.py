"""Plotting parity with the reference's utils/plot.py."""

from .plot import (plot_prediction_det, plot_prediction_det_animate,
                   plot_prediction_bayes, plot_prediction_bayes2, plot_MC2,
                   plot_UP, save_stats, save_samples, plot_row)
