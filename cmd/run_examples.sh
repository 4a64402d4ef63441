#!/bin/sh
# Canonical invocations — mirrors the reference cmd/run_examples.sh
# (same prompts / meshes / step counts; meshes come from the reference's
# load/shapes/objs, point MESH_DIR elsewhere if needed).
MESH_DIR=${MESH_DIR:-load/shapes/objs}

python launch.py --config configs/dreammat.yaml --train system.prompt_processor.prompt="A cute striped kitten"   system.geometry.shape_init=mesh:$MESH_DIR/cat.obj        trainer.max_steps=4000 system.geometry.shape_init_params=0.85
python launch.py --config configs/dreammat.yaml --train system.prompt_processor.prompt="A red apple"            system.geometry.shape_init=mesh:$MESH_DIR/apple.obj      trainer.max_steps=3000 system.geometry.shape_init_params=0.7
python launch.py --config configs/dreammat.yaml --train system.prompt_processor.prompt="the earth"              system.geometry.shape_init=mesh:$MESH_DIR/sphere.obj     trainer.max_steps=4000 system.geometry.shape_init_params=0.6 system.guidance.cond_scale=1.02
python launch.py --config configs/dreammat.yaml --train system.prompt_processor.prompt="A strawberry"           system.geometry.shape_init=mesh:$MESH_DIR/strawberry.obj trainer.max_steps=3000 system.geometry.shape_init_params=0.8
python launch.py --config configs/dreammat.yaml --train system.prompt_processor.prompt="A turtle"               system.geometry.shape_init=mesh:$MESH_DIR/turtle.obj     trainer.max_steps=3000 system.geometry.shape_init_params=1.0
python launch.py --config configs/dreammat.yaml --train system.prompt_processor.prompt="A brown basketball"     system.geometry.shape_init=mesh:$MESH_DIR/basketball.obj trainer.max_steps=3000 system.geometry.shape_init_params=0.6
python launch.py --config configs/dreammat.yaml --train system.prompt_processor.prompt="A natural grey rabbit"  system.geometry.shape_init=mesh:$MESH_DIR/rabbit.obj     trainer.max_steps=4000 system.geometry.shape_init_params=1.0
