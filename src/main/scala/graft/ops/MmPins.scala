package graft.ops

/** GENERATED pinned oracles for the mm_* kernels (tools/mm_oracle.py:
  * pure-python regeneration of the Media.scala PIXEL SPEC — no JVM
  * codec involved — cross-checked against engine output before
  * pinning). A match proves the javax.imageio encode→decode round
  * trip plus the luma/resample math end-to-end, independent of any
  * environment-owned bytes. */
object MmPins {
  val mmDecode: String = """SELECT file_name, width::INT AS width, height::INT AS height, mean_luma::BIGINT AS mean_luma, luma_hash::BIGINT AS luma_hash FROM (VALUES
('img_00.bmp', 48, 32, 126, -2032897524076255418),
('img_00.png', 48, 32, 126, 7500680823254831406),
('img_01.bmp', 48, 32, 127, -4721534134454891308),
('img_01.png', 48, 32, 127, 3810107657327109025),
('img_02.bmp', 48, 32, 127, -7879815044958478704),
('img_02.png', 48, 32, 127, 3260302252129596161),
('img_03.bmp', 48, 32, 128, -8412544710401515901),
('img_03.png', 48, 32, 128, -6694785512503336249),
('img_04.bmp', 48, 32, 126, -4486044645779364686),
('img_04.png', 48, 32, 126, 912944549874904645),
('img_05.bmp', 48, 32, 126, 5585222131064405956),
('img_05.png', 48, 32, 126, -7176556912858158567),
('img_06.bmp', 48, 32, 127, -4137117524546446254),
('img_06.png', 48, 32, 127, -8703462308846782446),
('img_07.bmp', 48, 32, 125, -7003697847444012046),
('img_07.png', 48, 32, 125, 3429489011590881816))
 t(file_name, width, height, mean_luma, luma_hash) ORDER BY file_name"""

  val mmFrames: String = """SELECT file_name, frame_idx::BIGINT AS frame_idx, width::INT AS width, height::INT AS height, mean_luma::BIGINT AS mean_luma, luma_hash::BIGINT AS luma_hash FROM (VALUES
('vid_0.gif', 0, 48, 32, 124, 7329563734601796624),
('vid_0.gif', 1, 48, 32, 127, -9016364359316462156),
('vid_0.gif', 2, 48, 32, 127, -8992121004254207132),
('vid_0.gif', 3, 48, 32, 124, 1681011277388276811),
('vid_0.gif', 4, 48, 32, 129, -7983609370901195650),
('vid_0.gif', 5, 48, 32, 126, -7430330792843848747),
('vid_1.gif', 0, 48, 32, 127, 1808131526570129033),
('vid_1.gif', 1, 48, 32, 125, -4270853030613308371),
('vid_1.gif', 2, 48, 32, 127, 9128342465201133444),
('vid_1.gif', 3, 48, 32, 126, -6136243902161239211),
('vid_1.gif', 4, 48, 32, 125, -3899436871774024250),
('vid_1.gif', 5, 48, 32, 128, 8830604683332787141),
('vid_2.gif', 0, 48, 32, 123, 4346450120218639842),
('vid_2.gif', 1, 48, 32, 126, -6857386476360868880),
('vid_2.gif', 2, 48, 32, 128, -4919812902174999173),
('vid_2.gif', 3, 48, 32, 129, -2382345735998151910),
('vid_2.gif', 4, 48, 32, 127, -1567545018544779169),
('vid_2.gif', 5, 48, 32, 126, -2502582703500499963))
 t(file_name, frame_idx, width, height, mean_luma, luma_hash) ORDER BY file_name, frame_idx"""

  val mmResize: String = """SELECT file_name, width::INT AS width, height::INT AS height, thumb_bytes::BIGINT AS thumb_bytes, thumb_checksum::BIGINT AS thumb_checksum FROM (VALUES
('img_00.bmp', 16, 16, 256, 1723629264318177964),
('img_00.png', 16, 16, 256, -9098869056480297575),
('img_01.bmp', 16, 16, 256, 964268361968473277),
('img_01.png', 16, 16, 256, 5121129884500731225),
('img_02.bmp', 16, 16, 256, 3191637223194111036),
('img_02.png', 16, 16, 256, -6352512824697757771),
('img_03.bmp', 16, 16, 256, -8117591410538381582),
('img_03.png', 16, 16, 256, 4966550879214787389),
('img_04.bmp', 16, 16, 256, -3082555419877948145),
('img_04.png', 16, 16, 256, -1127991741352197364),
('img_05.bmp', 16, 16, 256, -592702592720702666),
('img_05.png', 16, 16, 256, -3695529553735714967),
('img_06.bmp', 16, 16, 256, 5930919231754308975),
('img_06.png', 16, 16, 256, 764123014086028292),
('img_07.bmp', 16, 16, 256, -4135010105686994678),
('img_07.png', 16, 16, 256, 4634164413857326710))
 t(file_name, width, height, thumb_bytes, thumb_checksum) ORDER BY file_name"""

  val mmAudio: String = """SELECT file_name, win_idx::BIGINT AS win_idx, n_samples::BIGINT AS n_samples, abs_sum::BIGINT AS abs_sum, zero_crossings::BIGINT AS zero_crossings FROM (VALUES
('aud_0.wav', 0, 1000, 16031306, 534),
('aud_0.wav', 1, 1000, 16900635, 495),
('aud_0.wav', 2, 1000, 16695913, 519),
('aud_0.wav', 3, 1000, 16530748, 493),
('aud_0.wav', 4, 1000, 16797296, 491),
('aud_0.wav', 5, 1000, 16938110, 491),
('aud_0.wav', 6, 1000, 16629274, 516),
('aud_0.wav', 7, 1000, 16295771, 498),
('aud_0.wav', 8, 1000, 16110349, 514),
('aud_0.wav', 9, 1000, 15965662, 493),
('aud_0.wav', 10, 1000, 15928697, 528),
('aud_0.wav', 11, 1000, 16248220, 499),
('aud_1.wav', 0, 1000, 16457793, 500),
('aud_1.wav', 1, 1000, 16293729, 488),
('aud_1.wav', 2, 1000, 16183010, 488),
('aud_1.wav', 3, 1000, 15630996, 476),
('aud_1.wav', 4, 1000, 16089807, 510),
('aud_1.wav', 5, 1000, 16047939, 494),
('aud_1.wav', 6, 1000, 16575619, 517),
('aud_1.wav', 7, 1000, 16266888, 516),
('aud_2.wav', 0, 1000, 15904572, 466),
('aud_2.wav', 1, 1000, 16642948, 512),
('aud_2.wav', 2, 1000, 16217089, 502),
('aud_2.wav', 3, 1000, 16266193, 495),
('aud_2.wav', 4, 1000, 16816685, 478),
('aud_2.wav', 5, 1000, 15733968, 494),
('aud_2.wav', 6, 1000, 15850203, 492),
('aud_2.wav', 7, 1000, 16789585, 548),
('aud_2.wav', 8, 1000, 16909610, 527),
('aud_2.wav', 9, 1000, 16788489, 483),
('aud_2.wav', 10, 1000, 16672764, 460),
('aud_2.wav', 11, 1000, 16017815, 525),
('aud_2.wav', 12, 1000, 16635433, 503),
('aud_2.wav', 13, 1000, 16248810, 508),
('aud_2.wav', 14, 1000, 16074043, 477),
('aud_2.wav', 15, 1000, 16691846, 497),
('aud_2.wav', 16, 1000, 16187715, 488),
('aud_2.wav', 17, 1000, 16354135, 477),
('aud_2.wav', 18, 1000, 16471064, 488),
('aud_2.wav', 19, 1000, 16981461, 475))
 t(file_name, win_idx, n_samples, abs_sum, zero_crossings) ORDER BY file_name, win_idx"""
}
