"""Project-file structural validation (the XSD-contract equivalent,
project/project.xsd via project/project.cpp:80-91): good files pass,
malformed files are rejected with specific errors."""

import xml.etree.ElementTree as ET

import pytest

from conftest import EXAMPLE_PROJECT, example_project_available
from stereoreconstruction_tpu.data.schema import (
    validate_project_xml, ProjectValidationError)
from stereoreconstruction_tpu.data.project_io import load_project


GOOD = """
<project>
 <cameras>
  <camera id="c1">
   <projectionMatrix m11="1" m12="0" m13="0" m14="0" m21="0" m22="1"
                     m23="0" m24="0" m31="0" m32="0" m33="1" m34="0"/>
   <lensDistortion k1="0.1"/>
   <refractiveInterface px="320" py="240" dist="2.0"
                        refractiveRatio="1.333"/>
  </camera>
  <camera id="c2"/>
 </cameras>
 <imageSets>
  <imageSet id="s1">
   <image file="a.jpg" for="c1" default="yes"/>
   <image file="b.jpg" for="c2" exposure="0.5"/>
  </imageSet>
 </imageSets>
 <featureSets>
  <featureSet imageSet="s1" camera="c1">
   <feature type="checkerboard" x="1.5" y="2.5" index="0" cindex="3"
            imageSet="s1"/>
   <feature type="surf" x="3" y="4" index="1"/>
  </featureSet>
 </featureSets>
 <correspondenceSets>
  <correspondenceSet imageSet1="s1" camera1="c1" imageSet2="s1"
                     camera2="c2">
   <correspondence index1="0" index2="1"/>
  </correspondenceSet>
 </correspondenceSets>
</project>
"""


def v(xml):
    validate_project_xml(ET.fromstring(xml))


class TestValid:
    def test_full_document(self):
        v(GOOD)

    def test_empty_project(self):
        v("<project/>")

    @pytest.mark.skipif(not example_project_available(),
                        reason="example project not mounted")
    def test_example_project_validates(self):
        # load_project validates by default now
        proj = load_project(EXAMPLE_PROJECT)
        assert len(proj.cameras) == 8


class TestRejected:
    def cases(self):
        return [
            # wrong root
            ("<proj/>", "root element"),
            # out-of-order sections
            ("<project><imageSets/><cameras/></project>", "out of order"),
            # duplicate section
            ("<project><cameras/><cameras/></project>", "more than once"),
            # camera without id
            ("<project><cameras><camera/></cameras></project>",
             "missing required attribute 'id'"),
            # duplicate camera id (key cameraID)
            ("<project><cameras><camera id='a'/><camera id='a'/>"
             "</cameras></project>", "duplicate camera id"),
            # projectionMatrix missing an entry
            ("<project><cameras><camera id='a'>"
             "<projectionMatrix m11='1'/></camera></cameras></project>",
             "missing required attribute 'm12'"),
            # non-double matrix entry
            ("<project><cameras><camera id='a'><projectionMatrix "
             + " ".join(f"m{r}{c}='1'" for r in range(1, 4)
                        for c in range(1, 5)).replace("m11='1'",
                                                      "m11='x'")
             + "/></camera></cameras></project>", "invalid type"),
            # refractiveInterface missing dist
            ("<project><cameras><camera id='a'><refractiveInterface "
             "px='0' py='0' refractiveRatio='1.3'/></camera></cameras>"
             "</project>", "missing required attribute 'dist'"),
            # bad response channel
            ("<project><cameras><camera id='a'><response channel='cyan'>"
             + "<value>0</value>" * 256 + "</response></camera></cameras>"
             "</project>", "channel"),
            # short response curve
            ("<project><cameras><camera id='a'><response channel='red'>"
             + "<value>0</value>" * 10 + "</response></camera></cameras>"
             "</project>", ">= 256"),
            # image referencing unknown camera (keyref imageToCameraRef)
            ("<project><cameras><camera id='a'/></cameras><imageSets>"
             "<imageSet id='s'><image file='x.jpg' for='nope'/>"
             "</imageSet></imageSets></project>", "references no camera"),
            # image default must be 'yes'
            ("<project><cameras><camera id='a'/></cameras><imageSets>"
             "<imageSet id='s'><image file='x.jpg' default='no'/>"
             "</imageSet></imageSets></project>", "only 'yes'"),
            # duplicate imageSet id
            ("<project><imageSets><imageSet id='s'/><imageSet id='s'/>"
             "</imageSets></project>", "duplicate imageSet id"),
            # featureSet referencing unknown imageSet
            ("<project><cameras><camera id='a'/></cameras>"
             "<featureSets><featureSet imageSet='nope' camera='a'/>"
             "</featureSets></project>", "references no imageSet"),
            # feature missing required index
            ("<project><cameras><camera id='a'/></cameras><imageSets>"
             "<imageSet id='s'/></imageSets><featureSets>"
             "<featureSet imageSet='s' camera='a'>"
             "<feature type='surf' x='1' y='2'/></featureSet>"
             "</featureSets></project>",
             "missing required attribute 'index'"),
            # duplicate feature index within a set
            ("<project><cameras><camera id='a'/></cameras><imageSets>"
             "<imageSet id='s'/></imageSets><featureSets>"
             "<featureSet imageSet='s' camera='a'>"
             "<feature type='surf' x='1' y='2' index='0'/>"
             "<feature type='surf' x='3' y='4' index='0'/>"
             "</featureSet></featureSets></project>", "duplicate index"),
            # correspondence with negative index
            ("<project><cameras><camera id='a'/></cameras><imageSets>"
             "<imageSet id='s'/></imageSets><correspondenceSets>"
             "<correspondenceSet imageSet1='s' imageSet2='s' camera1='a' "
             "camera2='a'><correspondence index1='-1' index2='0'/>"
             "</correspondenceSet></correspondenceSets></project>",
             "invalid type"),
            # correspondenceSet referencing unknown camera2
            ("<project><cameras><camera id='a'/></cameras><imageSets>"
             "<imageSet id='s'/></imageSets><correspondenceSets>"
             "<correspondenceSet imageSet1='s' imageSet2='s' camera1='a' "
             "camera2='zz'/></correspondenceSets></project>",
             "references no camera"),
        ]

    def test_all_rejections(self):
        for xml, frag in self.cases():
            with pytest.raises(ProjectValidationError) as e:
                v(xml)
            assert frag in str(e.value), (frag, str(e.value))


class TestLoadRejectsMalformed:
    def test_load_project_raises(self, tmp_path):
        bad = tmp_path / "bad.xml"
        bad.write_text("<project><cameras><camera/></cameras></project>")
        with pytest.raises(ProjectValidationError):
            load_project(str(bad))
        # opt-out still parses (reference behavior without XmlPatterns)
        proj = load_project(str(bad), validate=False)
        assert proj.cameras == {"": proj.cameras[""]}
