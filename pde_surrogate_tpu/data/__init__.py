"""Data: HDF5 IO, permeability-field generators, device pipelines."""

from .hdf5 import load_data, save_dataset, dataset_path, load_args, save_args
from .grf import sample_kle, sample_warped_grf, sample_channelized, kle_basis
from .pipeline import DeviceDataset
