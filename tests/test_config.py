import textwrap

from dfnet_tpu.config import Config, parse_args, parse_config_file


def test_stage_defaults_differ():
    nerf = parse_args([], stage="nerf")
    feat = parse_args([], stage="feature")
    dm = parse_args([], stage="dm")
    assert nerf.no_grad_update is False
    assert dm.no_grad_update is True
    assert feat.learning_rate == 1e-4
    assert dm.learning_rate == 1e-5
    assert dm.combine_loss_w == [0.5, 0.5]
    assert feat.combine_loss_w == [1.0, 1.0, 1.0]


def test_parse_reference_style_config(tmp_path):
    cfg_txt = textwrap.dedent("""\
        ############ example ############
        model_name=dfnetdm
        expname=nerfh
        basedir=../logs/kings # change this if change scenes
        dataset_type=Cambridge
        trainskip=2 # train
        df=2
        load_pose_avg_stats=True
        NeRFH=True
        encode_hist=True
        freezeBN=True
        svd_reg=True
        combine_loss = True
        combine_loss_w = [0., 0., 1.]
        finetune_unlabel=True
        i_eval=20
        DFNet=True
        val_on_psnr=True
        feature_matching_lvl = [0]
    """)
    p = tmp_path / "config_dfnetdm.txt"
    p.write_text(cfg_txt)
    cfg = parse_args(["--config", str(p)], stage="dm")
    assert cfg.model_name == "dfnetdm"
    assert cfg.basedir == "../logs/kings"
    assert cfg.dataset_type == "Cambridge"
    assert cfg.trainskip == 2 and cfg.df == 2.0
    assert cfg.load_pose_avg_stats and cfg.NeRFH and cfg.encode_hist
    assert cfg.combine_loss is True
    assert cfg.combine_loss_w == [0.0, 0.0, 1.0]
    assert cfg.feature_matching_lvl == [0]
    assert cfg.finetune_unlabel and cfg.val_on_psnr and cfg.svd_reg
    assert cfg.i_eval == 20


def test_cli_overrides_config(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("df=2\ntestskip=50\n")
    cfg = parse_args(["--config", str(p), "--testskip", "1", "--render_test"], stage="nerf")
    assert cfg.testskip == 1
    assert cfg.df == 2.0
    assert cfg.render_test is True


def test_shipped_reference_configs_parse():
    # the three shipped reference config files must parse unchanged
    for path, stage in [
        ("/root/reference/script/config_nerfh.txt", "nerf"),
        ("/root/reference/script/config_dfnet.txt", "feature"),
        ("/root/reference/script/config_dfnetdm.txt", "dm"),
    ]:
        cfg = parse_args(["--config", path], stage=stage)
        assert cfg.dataset_type == "Cambridge"
        assert cfg.NeRFH and cfg.encode_hist


def test_parse_config_file_comments(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("# full comment\nexpname=abc#tail\n\nbad line without equals\n")
    kv = parse_config_file(str(p))
    assert kv == {"expname": "abc"}


def test_bool_string_false():
    cfg = parse_args(["--NeRFH", "False"], stage="nerf")
    assert cfg.NeRFH is False


def test_bare_flag_on_string_field_is_an_error():
    # `--pretrain_model_path --epochs 2` (e.g. after an empty shell
    # substitution) must fail loudly, not coerce the path to True
    import pytest

    with pytest.raises(SystemExit):
        parse_args(["--pretrain_model_path", "--epochs", "2"], stage="dm")


def test_compilation_cache_enabled(tmp_path):
    # parse_args is the single choke point that turns on the persistent
    # compile cache (config.py::_enable_compilation_cache); remote TPU
    # compiles are 20s-12min, so a silently-broken cache is a real
    # regression. "" must disable without error.
    import jax

    cache = tmp_path / "xla_cache"
    parse_args(["--compilation_cache_dir", str(cache)], stage="nerf")
    assert jax.config.jax_compilation_cache_dir == str(cache)
    assert cache.is_dir()
    # disable flag parses cleanly (per-process enable is sticky by design)
    cfg = parse_args(["--compilation_cache_dir", ""], stage="nerf")
    assert cfg.compilation_cache_dir == ""


def test_compilation_cache_unwritable_dir_is_nonfatal(tmp_path, capsys):
    # best-effort contract: an unwritable cache path must never break a
    # run (e.g. read-only $HOME under a sandbox)
    blocker = tmp_path / "f"
    blocker.write_text("not a dir")
    cfg = parse_args(["--compilation_cache_dir", str(blocker / "sub")],
                     stage="nerf")
    assert cfg is not None
    assert "compilation cache disabled" in capsys.readouterr().err
