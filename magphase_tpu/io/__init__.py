from .wav import (read_wav, read_wav_info, write_wav,
                  read_audio_file, write_audio_file)
from .featfile import read_binfile, write_binfile, write_featfile
from .est import read_est_file, read_reaper_est_file, write_reaper_est_file
from .scp import (read_scp_file, gen_list_of_file_paths, get_file_list,
                  get_filename, mkdir)

__all__ = [
    "read_wav", "read_wav_info", "write_wav", "read_audio_file", "write_audio_file",
    "read_binfile", "write_binfile", "write_featfile",
    "read_est_file", "read_reaper_est_file", "write_reaper_est_file",
    "read_scp_file", "gen_list_of_file_paths", "get_file_list",
    "get_filename", "mkdir",
]
