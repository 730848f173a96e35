"""Plotting parity with the reference's utils/plot.py."""

from .plot import (assemble_gif, imagegrid_pairs, plot_MC, plot_MC2,
                   plot_prediction_bayes, plot_prediction_bayes2,
                   plot_prediction_det, plot_prediction_det_animate,
                   plot_row, plot_UP, save_samples, save_stats)
