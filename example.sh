#!/usr/bin/env bash
# End-to-end TF-NAS-TPU recipes (the reference example.sh, TPU edition).
set -e

# 0. Build the TPU latency lookup table.
#    analytic = instant calibrated roofline; measure = real timings on the
#    attached chip (slower; stride-sampled + interpolated like the
#    reference's own fitted tables).
python make_lat_lut_tpu.py --mode analytic \
	--output ./latency_pkl/latency_tpu.pkl

# 1. Search on ImageNet-100 (90 epochs, batch 32, bi-sampling + soft arch
#    steps; same hyperparameters as the reference train_search.py).
python -u train_search.py \
	--img_root "Your ImageNet Train Set Path" \
	--train_list "./dataset/ImageNet-100-effb0_train_cls_ratio0.8.txt" \
	--val_list "./dataset/ImageNet-100-effb0_val_cls_ratio0.8.txt" \
	--lookup_path "./latency_pkl/latency_tpu.pkl" \
	--save "./checkpoints" \
	--print_freq 100 --workers 4 --epochs 90 --batch_size 32 \
	--w_lr 0.025 --w_mom 0.9 --w_wd 1e-5 \
	--a_lr 0.01 --a_wd 5e-4 --grad_clip 5.0 \
	--T 5.0 --T_decay 0.96 --num_classes 100 \
	--lambda_lat 0.1 --target_lat 1.0 \
	--note "TF-NAS-lam0.1-lat1.0-tpu"

# 2. Parse the searched architecture.
python -u parsing_model.py \
	--model_path "./checkpoints/search-*/searched_model_90.pkl" \
	--save_path "./model.config" \
	--lookup_path "./latency_pkl/latency_tpu.pkl" \
	--print_lat

# 3. Retrain on ImageNet-1k — data-parallel over every visible TPU chip,
#    bf16 activations, cross-replica BN (replaces plain/AMP/DDP variants).
python -u train_eval.py \
	--train_root "Your ImageNet Train Set Path" \
	--val_root "Your ImageNet Val Set Path" \
	--train_list "ImageNet Train List" \
	--val_list "ImageNet Val List" \
	--config_path "./model.config" \
	--save "./checkpoints" \
	--print_freq 100 --workers 16 --epochs 250 --batch_size 512 \
	--lr 0.2 --momentum 0.9 --weight_decay 1e-5 --grad_clip 5.0 \
	--label_smooth 0.1 --num_classes 1000 \
	--dropout_rate 0.2 --drop_connect_rate 0.2 \
	--note "TF-NAS-lat1.0-tpu"

# 4. Test.
python -u test.py \
	--val_root "Your ImageNet Val Set Path" \
	--val_list "ImageNet Val List" \
	--config_path "./model.config" \
	--weights "./checkpoints/eval-*/model_best.pkl" \
	--batch_size 512

# 5. Pareto multi-search: G independent target-latency searches sharded
#    over one device mesh ('pareto' x 'data'), each internally
#    data-parallel — the pod-scale mode the reference cannot express.
python -u train_search_pareto.py \
	--img_root "Your ImageNet Train Set Path" \
	--train_list "./dataset/ImageNet-100-effb0_train_cls_ratio0.8.txt" \
	--lookup_path "./latency_pkl/latency_tpu.pkl" \
	--target_lats 0.6,0.8,1.0,1.2 --epochs 90 --batch_size 32 \
	--save "./checkpoints" --note "pareto-4pt"
# resume a pareto run: --resume "./checkpoints/pareto-search-*/searched_model_g{g}_45.pkl"

# 5b. Multi-host (pod) retraining: run the SAME train_eval.py command on
#     every host of the slice. On Cloud TPU pods each worker autodetects
#     its coordinates from the metadata server — just set
#     TFNAS_DISTRIBUTED=1; on arbitrary clusters point every process at a
#     coordinator. --batch_size stays the GLOBAL batch; each host loads its
#     own ImageList shard (DistributedSampler equivalent) and only host 0
#     writes checkpoints/logs.
#
#   # TPU pod slice (one command per worker, e.g. via gcloud ... --worker=all):
#   TFNAS_DISTRIBUTED=1 python -u train_eval.py --config_path ./model.config \
#       --train_root ... --train_list ... --val_root ... --val_list ... \
#       --batch_size 1024 --save ./checkpoints --note pod-eval
#
#   # generic cluster (N processes, one per host):
#   JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i \
#       python -u train_eval.py ...same flags...
#
#   train_search_pareto.py accepts the same environment (per-host input
#   shards feed the global ['pareto','data'] mesh).

# 6. Hybrid conv/ViT search (attention candidates at stages 4-6): build the
#    hybrid table (adds the 5 ViTBlock keys), then search with
#    --space hybrid; parsing/retraining/testing are space-agnostic.
python make_lat_lut_tpu.py --mode analytic --space hybrid \
	--output ./latency_pkl/latency_tpu_hybrid.pkl
python -u train_search.py \
	--img_root "Your ImageNet Train Set Path" \
	--train_list "./dataset/ImageNet-100-effb0_train_cls_ratio0.8.txt" \
	--val_list "./dataset/ImageNet-100-effb0_val_cls_ratio0.8.txt" \
	--lookup_path "./latency_pkl/latency_tpu_hybrid.pkl" \
	--space hybrid --epochs 90 --batch_size 32 --target_lat 1.0 \
	--save "./checkpoints" --note "hybrid-lat1.0"

# 7. Self-contained end-to-end loop on the real-JPEG proxy set (no ImageNet
#    needed; dataset/make_proxy_dataset.py v2 is compositional so the DEPTH
#    freedom is genuinely exercised — see docs/E2E_PROXY_RUN.md). The
#    watchdog supervises the search across relay stalls/outages.
python dataset/make_proxy_dataset.py --out_root /root/data/proxy100 \
	--num_classes 100 --train_per_class 140 --val_per_class 30
python tools_run_watchdog.py --save ./checkpoints_e2e --stall_sec 900 -- \
	python train_search.py --img_root /root/data/proxy100 \
	--train_list /root/data/proxy100/proxy_train.txt \
	--val_list /root/data/proxy100/proxy_val.txt \
	--lookup_path ./latency_pkl/latency_tpu_v5e_bs32.pkl \
	--epochs 16 --warmup_epochs 4 --batch_size 32 --image_size 224 \
	--target_lat 0.20 --T_decay 0.85 --save_freq 4 --num_classes 100 \
	--save ./checkpoints_e2e --note proxy2-e2e
python tools_search_report.py --run_dir "./checkpoints_e2e/search-*-proxy2-e2e" \
	--lookup_path ./latency_pkl/latency_tpu_v5e_bs32.pkl
python parsing_model.py \
	--model_path "./checkpoints_e2e/search-*-proxy2-e2e/searched_model_16.pkl" \
	--save_path ./model_proxy2.config \
	--lookup_path ./latency_pkl/latency_tpu_v5e_bs32.pkl --num_classes 100
python -u train_eval.py --config_path ./model_proxy2.config \
	--train_root /root/data/proxy100 --val_root /root/data/proxy100 \
	--train_list /root/data/proxy100/proxy_train.txt \
	--val_list /root/data/proxy100/proxy_val.txt \
	--epochs 18 --batch_size 64 --lr 0.05 --num_classes 100 \
	--save ./checkpoints_e2e --note proxy2-retrain
python test.py --config_path ./model_proxy2.config \
	--weights "./checkpoints_e2e/eval-*-proxy2-retrain/model_best.pkl" \
	--val_root /root/data/proxy100 \
	--val_list /root/data/proxy100/proxy_val.txt --num_classes 100
