#!/bin/bash
# Large-scale multi-host recipe (TPU equivalent of the reference
# docs/script_examples/stability_example.sh, which drives 30 nodes x 8 A100 via
# SLURM + NCCL). On TPU the same run is a pod slice: one python process per host,
# jax.distributed rendezvous via OCT_* / SLURM env vars, collectives over ICI —
# no NCCL/MPI tuning block needed.
#
# Under SLURM (one task per TPU host):
#SBATCH --job-name=openclip-tpu
#SBATCH --nodes 8                 # v5e-64: 8 hosts x 8 chips
#SBATCH --ntasks-per-node=1
#SBATCH --output=%x_%j.out
#
# OCT_COORDINATOR / OCT_NUM_PROCESSES / OCT_PROCESS_ID are discovered from SLURM
# automatically (parallel/distributed.py); set them explicitly for bare-metal pods:
#   export OCT_COORDINATOR=<host0>:8476 OCT_NUM_PROCESSES=8 OCT_PROCESS_ID=<i>

EXP_NAME="B-32-laion5b-bs90k-tpu"

srun python -m open_clip_tpu.train.main \
    --save-frequency 1 \
    --train-data "pipe:aws s3 cp s3://s-datasets/laion5b/{laion2B-data/{000000..231349}.tar,laion2B-multi-data/{000000..226687}.tar,laion1B-nolang-data/{000000..127231}.tar} -" \
    --train-num-samples 135646078 \
    --dataset-type webdataset \
    --dataset-resampled \
    --warmup 2000 \
    --batch-size 1408 \
    --epochs 97 \
    --lr 1e-3 \
    --workers 2 \
    --report-to wandb \
    --name "${EXP_NAME}" \
    --logs /scratch/logs/ \
    --model ViT-B-32 \
    --seed 0 \
    --local-loss \
    --gather-with-grad \
    --grad-checkpointing \
    --precision amp_bf16 \
    --device-preprocess \
    --native-decode-threads 4 \
    --wandb-project-name open_clip_tpu \
    --resume latest \
    --remote-sync s3://s-laion/logs
# batch-size is per process (= per host, 8 chips): 1408 x 64 hosts' chips / 8 ~ 90k
# global as in the reference run. --device-preprocess ships uint8 batches to the
# chips and fuses RandomResizedCrop+normalize into the train step (the host needs
# ~2 decode cores per chip with --native-decode-threads, vs 8-12 loader cores per
# GPU in the reference run; docs/ROUND3.md "Measured pipeline balance").
